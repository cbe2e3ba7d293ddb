"""Checkpoint / resume.

The reference only ``torch.save``s the best-val ``state_dict``
(``model/traintest_MegaCRN.py:144``) — no optimizer state, no RNG, no
mid-run resume. Here a checkpoint carries the full restartable training
state: {params, opt_state, batches_seen, epoch, best_val, rng key, scaler
stats}, so a killed run resumes exactly (SURVEY.md section 5
"checkpoint/resume").

Two storage backends:

* ``npz`` (default): atomic single-file write keyed by pytree paths —
  dependency-free, diffable, right for single-host runs.
* ``orbax``: directory-format Orbax checkpoint. On a multi-host mesh each
  process writes only its addressable shards and restore honors the sharding
  of the templates — the production choice for sharded params/opt state.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = flat[key]
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, params, opt_state=None, *,
                    metadata: Optional[Dict[str, Any]] = None,
                    arrays: Optional[Dict[str, np.ndarray]] = None):
    """Atomic write: tmp file + rename. ``path`` should end in .npz.

    ``arrays`` carries array-valued training state that must survive
    losslessly (the live PRNG key, per-column scaler stats): JSON metadata
    would collapse or truncate them. They come back merged into the metadata
    dict on load, as numpy arrays.
    """
    blob = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        blob.update({f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    for k, v in (arrays or {}).items():
        blob[f"extra/{k}"] = np.asarray(v)
    blob["meta/json"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **blob)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_checkpoint(path: str, params_template, opt_state_template=None
                    ) -> Tuple[Any, Any, Dict]:
    """Restore (params, opt_state, metadata); opt_state is None when no
    template is given or the checkpoint has no optimizer state."""
    if os.path.isdir(path):  # orbax checkpoints are directories
        return load_checkpoint_orbax(path, params_template, opt_state_template)
    with np.load(path) as z:
        blob = dict(z)
    meta = json.loads(bytes(blob.pop("meta/json").tobytes()).decode())
    for k in [k for k in blob if k.startswith("extra/")]:
        meta[k[len("extra/"):]] = blob.pop(k)
    pflat = {k[len("params/"):]: v for k, v in blob.items()
             if k.startswith("params/")}
    params = _unflatten_like(params_template, pflat)
    opt_state = None
    if opt_state_template is not None:
        oflat = {k[len("opt/"):]: v for k, v in blob.items()
                 if k.startswith("opt/")}
        if oflat:
            opt_state = _unflatten_like(opt_state_template, oflat)
    return params, opt_state, meta


def save_checkpoint_orbax(path: str, params, opt_state=None, *,
                          metadata: Optional[Dict[str, Any]] = None,
                          arrays: Optional[Dict[str, np.ndarray]] = None):
    """Orbax directory checkpoint of the same training state.

    Sharded arrays are written distributed (each host saves its addressable
    shards); overwriting an existing checkpoint is allowed to keep the
    best-val overwrite-in-place semantics of the reference
    (model/traintest_MegaCRN.py:144).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = {"params": params}
    if opt_state is not None:
        state["opt"] = opt_state
    meta = dict(metadata or {})
    for k, v in (arrays or {}).items():
        # JSON-encode losslessly (float32/float64 round-trip exactly through
        # Python floats; PRNG keys are uint32 ints) — a template-driven
        # StandardRestore cannot restore keys absent from the template.
        a = np.asarray(v)
        meta[k] = {"__array__": True, "dtype": a.dtype.str,
                   "data": a.tolist()}
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(path, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(meta),
        ), force=True)


def load_checkpoint_orbax(path: str, params_template, opt_state_template=None
                          ) -> Tuple[Any, Any, Dict]:
    """Restore from an Orbax directory checkpoint. Templates fix pytree
    structure, dtypes, and shardings (pass mesh-placed templates to restore
    sharded on a multi-host mesh)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {"params": params_template}
    if opt_state_template is not None:
        template["opt"] = opt_state_template
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(path, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template),
            meta=ocp.args.JsonRestore(),
        ))
    params = restored["state"]["params"]
    opt_state = restored["state"].get("opt")
    meta = dict(restored["meta"] or {})
    for k, v in meta.items():
        if isinstance(v, dict) and v.get("__array__"):
            meta[k] = np.asarray(v["data"], dtype=np.dtype(v["dtype"]))
    return params, opt_state, meta
