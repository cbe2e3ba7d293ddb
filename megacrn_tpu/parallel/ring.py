"""Explicit-collective node-partitioned graph aggregation (shard_map).

The default multi-chip path lets GSPMD insert the all-gather for
``supports @ x`` from sharding constraints (``megacrn_tpu.parallel.api``).
This module is the manual-schedule alternative for when the collective
placement matters: a ring algorithm under ``shard_map`` where each step
``ppermute``s the neighbor's x node-block around the ring while the local
block-column matmul runs — communication hidden under compute, the classic
TPU ring-matmul schedule (SURVEY.md section 5 "node/edge partitioning";
collectives ride ICI neighbor links).

Per device (p devices, local rows n_loc = N/p):
  support_local: (n_loc, N) row-block of the dense support
  x_local:       (B, n_loc, C) node-block of features
  y_local[b, i, c] = sum_m support_local[i, m] * x[b, m, c]
computed as p partial block-column matmuls, one per ring hop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_support_matmul(support_local: jnp.ndarray, x_local: jnp.ndarray,
                        axis_name: str) -> jnp.ndarray:
    """Inside shard_map: y_local = (row-block of A) @ (all x), via ring."""
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_loc = x_local.shape[1]
    # support_local columns grouped by owner block: (n_loc, p, n_loc)
    cols = support_local.reshape(n_loc, p, n_loc)

    def partial(block_owner, x_block):
        a = jnp.take(cols, block_owner, axis=1)  # (n_loc, n_loc)
        return jnp.einsum("nm,bmc->bnc", a, x_block,
                          preferred_element_type=x_block.dtype)

    acc = partial(idx, x_local)
    buf = x_local
    perm = [(i, (i - 1) % p) for i in range(p)]  # shift toward lower rank
    for s in range(1, p):
        # After s hops the buffer holds block (idx + s) mod p; the ppermute
        # is issued before the matmul so XLA can overlap it with compute.
        buf = jax.lax.ppermute(buf, axis_name, perm)
        acc = acc + partial((idx + s) % p, buf)
    return acc


def make_ring_aggregate(mesh: Mesh, node_axis: str = "node",
                        data_axis: str = "data"):
    """Returns a jitted ``(support (N, N), x (B, N, C)) -> (B, N, C)`` that
    runs the ring schedule over the mesh's node axis (batch stays sharded
    over the data axis)."""
    from megacrn_tpu.parallel.api import shard_map

    fn = shard_map(
        functools.partial(ring_support_matmul, axis_name=node_axis),
        mesh=mesh,
        in_specs=(P(node_axis, None), P(data_axis, node_axis, None)),
        out_specs=P(data_axis, node_axis, None),
    )
    return jax.jit(fn)
