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


def local_meta_supports(memory: jnp.ndarray, we1: jnp.ndarray,
                        we2: jnp.ndarray, axis_name: str,
                        n_local: int) -> jnp.ndarray:
    """Per-device row-block of the meta-graph supports (inside shard_map).

    Same math as ``ops.graph.meta_graph`` (model/MegaCRN.py:168-173) but each
    device materialises only its n_local rows of the two N x N supports: the
    node embeddings E1/E2 are tiny (N x d) and computed replicated from the
    replicated memory params, then sliced by ``axis_index``. Row softmax runs
    over the full (local) row, so the blocks are exact.

    Returns (2, n_local, N).
    """
    e1 = we1 @ memory  # (N, d), replicated compute
    e2 = we2 @ memory
    idx = jax.lax.axis_index(axis_name)
    e1_loc = jax.lax.dynamic_slice_in_dim(e1, idx * n_local, n_local, 0)
    e2_loc = jax.lax.dynamic_slice_in_dim(e2, idx * n_local, n_local, 0)
    g1 = jax.nn.softmax(jax.nn.relu(e1_loc @ e2.T), axis=-1)
    g2 = jax.nn.softmax(jax.nn.relu(e2_loc @ e1.T), axis=-1)
    return jnp.stack([g1, g2], axis=0)


def cheb_aggregate_ring(supports: jnp.ndarray, x: jnp.ndarray, cheb_k: int,
                        axis_name: str) -> jnp.ndarray:
    """Chebyshev feature stack (reference order, ops.graph.cheb_aggregate)
    where every ``A @ x`` is the explicit ring schedule over the node axis.

    supports: (S, n_local, N) local row-blocks; x: (B, n_local, C) local
    node-block. Returns (B, n_local, S*cheb_k, C).
    """
    terms = []
    for s in range(supports.shape[0]):
        a = supports[s]
        t_prev = x
        t_cur = ring_support_matmul(a, x, axis_name)
        terms.append(t_prev)
        terms.append(t_cur)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, (
                2.0 * ring_support_matmul(a, t_cur, axis_name) - t_prev)
            terms.append(t_cur)
    return jnp.stack(terms, axis=2)


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


def cheb_aggregate_sparse_sharded(packs, x: jnp.ndarray, cheb_k: int,
                                  axis_name: str) -> jnp.ndarray:
    """Node-partitioned Chebyshev stack over STATIC sparse road supports
    (inside shard_map): each device holds the row-block BlockELL packs of its
    nodes (``kernels.spmm.shard_road_packs``), all-gathers the x node-blocks
    over the node axis (rides ICI), and runs the Pallas SpMM only on its
    rows. The Chebyshev recursion needs full-length inputs, so intermediate
    terms are re-gathered (cheb_k - 2 extra gathers per support); the stacked
    output stays node-local. Autodiff of the tiled all_gather inserts the
    psum_scatter for dx; dA = 0 by the SpMM custom VJP.

    packs: per-device [(BlockELL (n_loc x N), BlockELL_t (N x n_loc)), ...];
    x: (B, n_loc, C) local node-block. Returns (B, n_loc, S*cheb_k, C).
    """
    from megacrn_tpu.kernels.spmm import spmm_batched

    def gather(t):  # (B, n_loc, C) -> (B, N, C)
        return jax.lax.all_gather(t, axis_name, axis=1, tiled=True)

    x_full = gather(x)
    terms = []
    for pack, pack_t in packs:
        t_prev_l = x
        t_cur_l = spmm_batched(pack, pack_t, x_full)
        terms.append(t_prev_l)
        terms.append(t_cur_l)
        for _ in range(2, cheb_k):
            t_cur_f = gather(t_cur_l)
            t_prev_l, t_cur_l = t_cur_l, (
                2.0 * spmm_batched(pack, pack_t, t_cur_f) - t_prev_l)
            terms.append(t_cur_l)
    return jnp.stack(terms, axis=2)
