"""Pallas block-sparse SpMM for static graph supports.

The learned meta-graph supports are dense row-stochastic matrices — for those
the MXU dense matmul is the right tool (SURVEY.md 7.4). The sparse win is the
**static road graph** (EXPY-TKY ``adj01``, nnz ~ 4N of N^2): this kernel
stores the support in block-ELL form (128x128 tiles, per-row-block column
lists) and computes ``y = A @ x`` touching only nonzero tiles. The sparsity
pattern is fixed at trace time (scalar-prefetched tile indices), so the whole
thing jits into one Mosaic kernel with double-buffer-friendly VMEM blocks.

Gradient: ``d/dx (A @ x) = A^T @ g`` — served by the same kernel with the
transposed block structure, wired via custom_vjp (A is a constant, no dA).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # MXU tile


class BlockELL(NamedTuple):
    """Block-ELL sparse matrix. n is the padded dimension (multiple of 128).

    data: (nblk_rows, max_blocks, BLOCK, BLOCK) nonzero tiles per row-block,
      padded with zero tiles.
    cols: (nblk_rows, max_blocks) int32 column-block index per tile; padding
      entries repeat a valid index (their data tile is zero, so they
      contribute nothing — keeps every load in-bounds with no branching).
    nnz_blocks: (nblk_rows,) number of real tiles per row-block.
    n: padded matrix dim; n_orig: original dim.
    """

    data: jnp.ndarray
    cols: jnp.ndarray
    nnz_blocks: jnp.ndarray
    n: int
    n_orig: int


def to_block_ell(a: np.ndarray) -> BlockELL:
    """Pack a (possibly non-multiple-of-128) dense numpy matrix with a sparse
    pattern into BlockELL."""
    n_orig = a.shape[0]
    n = ((n_orig + BLOCK - 1) // BLOCK) * BLOCK
    ap = np.zeros((n, n), a.dtype)
    ap[:n_orig, :n_orig] = a
    nblk = n // BLOCK
    tiles = ap.reshape(nblk, BLOCK, nblk, BLOCK).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > 0  # (nblk, nblk) block mask
    max_blocks = max(1, int(nz.sum(1).max()))
    data = np.zeros((nblk, max_blocks, BLOCK, BLOCK), np.float32)
    cols = np.zeros((nblk, max_blocks), np.int32)
    nnz = np.zeros((nblk,), np.int32)
    for i in range(nblk):
        cs = np.nonzero(nz[i])[0]
        nnz[i] = len(cs)
        for r, c in enumerate(cs):
            data[i, r] = tiles[i, c]
            cols[i, r] = c
        # pad with a repeated valid index pointing at zero data
        cols[i, len(cs):] = cs[0] if len(cs) else 0
    return BlockELL(jnp.asarray(data), jnp.asarray(cols), jnp.asarray(nnz),
                    n, n_orig)


def transpose_block_ell(a: np.ndarray) -> BlockELL:
    return to_block_ell(np.ascontiguousarray(a.T))


def rcm_ordering(adj: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee node ordering (BFS by ascending degree).

    Road graphs have spatial locality but arbitrary node numbering; RCM
    reduces bandwidth so nonzeros cluster near the diagonal and the 128x128
    block pack touches far fewer tiles. Apply as
    ``adj[perm][:, perm]`` (and permute node features consistently).
    """
    n = adj.shape[0]
    pattern = (np.abs(adj) + np.abs(adj.T)) > 0
    degree = pattern.sum(1)
    visited = np.zeros(n, bool)
    order = []
    while len(order) < n:
        # start each component from its minimum-degree unvisited node
        start = int(np.argmin(np.where(visited, np.iinfo(np.int64).max,
                                       degree)))
        queue = [start]
        visited[start] = True
        while queue:
            u = queue.pop(0)
            order.append(u)
            nbrs = np.nonzero(pattern[u] & ~visited)[0]
            nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
            for v in nbrs:
                visited[v] = True
                queue.append(int(v))
    return np.asarray(order[::-1], np.int64)


def _spmm_kernel(cols_ref, data_ref, x_ref, o_ref, acc_ref):
    """Grid: (nblk_rows, f_tiles, max_blocks). The r-axis (innermost) sweeps
    the row-block's tile list; x's BlockSpec index_map chases cols[i, r] via
    scalar prefetch, so each step loads exactly the needed x tile."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(data_ref[0, 0], x_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(r == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _spmm_padded(a: BlockELL, x: jnp.ndarray, interpret: bool = False
                 ) -> jnp.ndarray:
    """x: (n, f) with n == a.n and f a multiple of 128.

    The feature tile is as wide as fits comfortably in VMEM (up to 8 lanes of
    128): each grid program then runs a (128, 128) @ (128, f_blk) MXU matmul
    instead of a square-tile one — at road-graph sparsity the kernel is
    launch/latency-bound, so fewer, fatter programs win.
    """
    n, f = x.shape
    nblk = n // BLOCK
    max_blocks = a.cols.shape[1]
    # Feature tile up to 4 lanes of 128: each program runs a
    # (128, 128) @ (128, <=512) MXU matmul. Wider tiles were measured to
    # compile pathologically slowly through the remote Mosaic path.
    f_blk = min(f, 4 * BLOCK)
    pad = (-f) % f_blk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        f = x.shape[1]
    f_tiles = f // f_blk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cols
        grid=(nblk, f_tiles, max_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK, BLOCK),
                         lambda i, j, r, cols: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, f_blk),
                         lambda i, j, r, cols: (cols[i, r], j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, f_blk),
                               lambda i, j, r, cols: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLOCK, f_blk), jnp.float32)],
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        interpret=interpret,
    )(a.cols, a.data, x)


def _pad_cols(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    f = x.shape[1]
    pad = (-f) % mult
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def _auto_interpret(interpret):
    if interpret is None:
        # Mosaic only exists on TPU; interpret everywhere else (CPU tests).
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 3))
def spmm(a: BlockELL, a_t: BlockELL, x: jnp.ndarray,
         interpret=None) -> jnp.ndarray:
    """y = A @ x for a static-pattern sparse A.

    a / a_t: forward and transposed BlockELL packs (host-built, constants
    under jit). x: (n_orig, f). Returns (n_orig, f).
    interpret=None auto-selects interpreter mode off-TPU.
    """
    return _spmm_fwd(a, a_t, x, interpret)[0]


def _spmm_impl(a: BlockELL, x: jnp.ndarray, interpret) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    n_orig, f = x.shape
    xp = jnp.zeros((a.n, f), x.dtype).at[:n_orig].set(x)
    xp = _pad_cols(xp, BLOCK)
    y = _spmm_padded(a, xp, interpret)
    return y[:n_orig, :f]


def _spmm_fwd(a, a_t, x, interpret):
    return _spmm_impl(a, x, interpret), None


def _spmm_bwd(a, a_t, interpret, _res, g):
    return (_spmm_impl(a_t, g, interpret),)


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_batched(a: BlockELL, a_t: BlockELL, x: jnp.ndarray,
                 interpret=None) -> jnp.ndarray:
    """Batched aggregation ``einsum('nm,bmc->bnc')`` through the kernel:
    (B, n, C) -> fold (B, C) into the feature axis -> one SpMM."""
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
    y = spmm(a, a_t, flat, interpret)
    return jnp.transpose(y.reshape(n, b, c), (1, 0, 2))
