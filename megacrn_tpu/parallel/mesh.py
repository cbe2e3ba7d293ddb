"""Device mesh construction and sharding specs.

The reference is strictly single-device (SURVEY.md section 2.5), so this layer
is green-field. The scaling axis of the MegaCRN family is the node count N
(the N x N learned supports make cost O(N^2) per gate per step), so the mesh
is 2-D:

* ``data`` — batch parallelism (gradients psum'd by GSPMD).
* ``node`` — graph partition (the TP/SP analog for GNNs): node axis of
  states/features and row-blocks of the supports live on different chips; the
  ``supports @ x`` aggregation becomes local row-block matmuls fed by an
  all-gather of the x node-blocks over ICI, which XLA inserts from the
  sharding constraints.

Replicated: memory bank (M <= 20), Wq, cell weights, proj. Node-sharded:
We1/We2 (rows are nodes), supports (rows), all node-axis activations.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
NODE_AXIS = "node"


def make_mesh(data: int = 1, node: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data * node > len(devices):
        raise ValueError(
            f"mesh {data}x{node} needs {data * node} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices[: data * node]).reshape(data, node)
    return Mesh(dev_array, (DATA_AXIS, NODE_AXIS))


def param_sharding(mesh: Mesh, params: Dict) -> Dict:
    """NamedSharding pytree: We1/We2 row-sharded over ``node``, rest
    replicated."""
    repl = NamedSharding(mesh, P())
    node_rows = NamedSharding(mesh, P(NODE_AXIS, None))

    def assign(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if keys[-1] in ("We1", "We2"):
            return node_rows
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, N, C) tensors: batch over data, nodes over node."""
    return NamedSharding(mesh, P(DATA_AXIS, None, NODE_AXIS, None))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    return jax.device_put(params, param_sharding(mesh, params))


def shard_batch(arrays, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrays)


def make_shard_fn(mesh: Mesh):
    """The constraint hook threaded into ``megacrn.forward`` — pins supports
    to row-blocks and node-axis activations to the node axis so the layout is
    stable across scan iterations."""
    specs = {
        "supports": P(None, NODE_AXIS, None),  # (S, N, N) row-blocked
        "state": P(DATA_AXIS, NODE_AXIS, None),  # (B, N, H)
        # sparse_meta learned tiles (nblk, R, 128, 128): row-block dim over
        # node — the block-sparse aggregation partitions by output rows
        # instead of replicating the learned graph.
        "tiles": P(NODE_AXIS, None, None, None),
        # sparse_meta node-granular (N, D) edge weights: rows over node.
        "node_weights": P(NODE_AXIS, None),
    }

    def shard_fn(kind, t):
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, specs[kind]))

    # Advertise node partitioning so megacrn.forward keeps the per-support
    # recursion there (the stacked polynomial matrix has no row-block layout
    # aligned with the (S, N, N) supports constraint).
    shard_fn.node_sharded = dict(mesh.shape).get(NODE_AXIS, 1) > 1
    return shard_fn
