"""Interop with reference PyTorch checkpoints.

Lets a user of the reference repo load a trained ``.pt`` state_dict (saved by
``model/traintest_MegaCRN.py:144``) straight into the megacrn-tpu parameter
pytree. The AGCN weights share the (in, out) layout with the reference
(applied via ``einsum('bni,io->bno')``, ``model/MegaCRN.py:27``); only the
``nn.Linear`` projection head is transposed.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def params_from_flat(flat: Mapping[str, np.ndarray], num_layers: int,
                     dtype=jnp.float32) -> Dict:
    """Build the params pytree from a flat ``{path: array}`` mapping using
    megacrn-tpu path names (``memory/Memory``, ``encoder/0/gate/W``, ...).
    ``dtype=jnp.float64`` (with jax_enable_x64) preserves double checkpoints
    for the precision-control parity runs."""

    def arr(k):
        return jnp.asarray(np.asarray(flat[k]), dtype)

    def cells(mod):
        return [
            {
                "gate": {"W": arr(f"{mod}/{i}/gate/W"), "b": arr(f"{mod}/{i}/gate/b")},
                "update": {"W": arr(f"{mod}/{i}/update/W"), "b": arr(f"{mod}/{i}/update/b")},
            }
            for i in range(num_layers)
        ]

    return {
        "memory": {k: arr(f"memory/{k}") for k in ["Memory", "Wq", "We1", "We2"]},
        "encoder": cells("encoder"),
        "decoder": cells("decoder"),
        "proj": {"W": arr("proj/W"), "b": arr("proj/b")},
    }


def flat_from_torch_state_dict(sd: Mapping, num_layers: int) -> Dict[str, np.ndarray]:
    """Convert a reference ``state_dict`` (tensor or ndarray values) to the
    flat megacrn-tpu naming. Accepts the exact module names of
    ``model/MegaCRN.py`` (memory.*, {encoder,decoder}.dcrnn_cells.i.{gate,update}.*,
    proj.0.*)."""

    def npy(v):
        # Deep copy: .numpy() ALIASES the live tensor's memory, and jax on
        # CPU zero-copies aligned numpy buffers — without the copy a later
        # in-place torch optimizer step would silently mutate the converted
        # params.
        if hasattr(v, "detach"):
            return np.array(v.detach().cpu().numpy(), copy=True)
        return np.array(v, copy=True)

    flat = {}
    for name in ["Memory", "Wq", "We1", "We2"]:
        flat[f"memory/{name}"] = npy(sd[f"memory.{name}"])
    for mod in ["encoder", "decoder"]:
        for i in range(num_layers):
            for sub in ["gate", "update"]:
                flat[f"{mod}/{i}/{sub}/W"] = npy(sd[f"{mod}.dcrnn_cells.{i}.{sub}.weights"])
                flat[f"{mod}/{i}/{sub}/b"] = npy(sd[f"{mod}.dcrnn_cells.{i}.{sub}.bias"])
    flat["proj/W"] = npy(sd["proj.0.weight"]).T
    flat["proj/b"] = npy(sd["proj.0.bias"])
    return flat


def params_from_torch_checkpoint(path: str, num_layers: int) -> Dict:
    """Load a reference ``.pt`` checkpoint into a megacrn-tpu params pytree.

    Requires torch at call time (torch is not a dependency of the training
    path)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return params_from_flat(flat_from_torch_state_dict(sd, num_layers), num_layers)


def gts_params_from_torch_state_dict(sd: Mapping, cfg) -> Dict:
    """Convert a reference GTS ``state_dict`` (model/GTS.py module names,
    incl. the LayerParams shape-keyed weight names) into the megacrn-tpu GTS
    params + bn_state pytrees. ``cfg`` is a ``megacrn_tpu.config.GTSConfig``.

    Returns (params, bn_state).
    """

    def npy(v):
        # Deep copy — see flat_from_torch_state_dict.
        if hasattr(v, "detach"):
            return np.array(v.detach().cpu().numpy(), copy=True)
        return np.array(v, copy=True)

    def arr(k):
        return jnp.asarray(npy(sd[k]), jnp.float32)

    units = cfg.rnn_units
    k1 = cfg.max_diffusion_step + 1

    def cells(mod, tag_in):
        out = []
        for i in range(cfg.num_layers):
            layer_in = tag_in if i == 0 else units
            gshape = ((layer_in + units) * k1, 2 * units)
            cshape = ((layer_in + units) * k1, units)
            p = f"{mod}.dcgru_layers.{i}"
            out.append({
                "gate": {"W": arr(f"{p}.gconv_weight_{gshape}"),
                         "b": arr(f"{p}.gconv_biases_{2 * units}")},
                "candidate": {"W": arr(f"{p}.gconv_weight_{cshape}"),
                              "b": arr(f"{p}.gconv_biases_{units}")},
            })
        return out

    params = {
        "conv1": {"W": arr("conv1.weight"), "b": arr("conv1.bias")},
        "conv2": {"W": arr("conv2.weight"), "b": arr("conv2.bias")},
        "fc": {"W": arr("fc.weight").T, "b": arr("fc.bias")},
        "fc_out": {"W": arr("fc_out.weight").T, "b": arr("fc_out.bias")},
        "fc_cat": {"W": arr("fc_cat.weight").T, "b": arr("fc_cat.bias")},
        "bn1": {"scale": arr("bn1.weight"), "bias": arr("bn1.bias")},
        "bn2": {"scale": arr("bn2.weight"), "bias": arr("bn2.bias")},
        "bn3": {"scale": arr("bn3.weight"), "bias": arr("bn3.bias")},
        "encoder": cells("encoder_model", cfg.input_dim),
        "decoder": cells("decoder_model", cfg.output_dim),
        "proj": {"W": arr("decoder_model.projection_layer.weight").T,
                 "b": arr("decoder_model.projection_layer.bias")},
    }
    bn_state = {f"bn{i}": {"mean": arr(f"bn{i}.running_mean"),
                           "var": arr(f"bn{i}.running_var")}
                for i in (1, 2, 3)}
    return params, bn_state
