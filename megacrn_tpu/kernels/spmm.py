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
    """Block-ELL sparse matrix (possibly rectangular).

    data: (nblk_rows, max_blocks, BLOCK, BLOCK) nonzero tiles per row-block,
      padded with zero tiles.
    cols: (nblk_rows, max_blocks) int32 column-block index per tile; padding
      entries repeat a valid index (their data tile is zero, so they
      contribute nothing — keeps every load in-bounds with no branching).
    nnz_blocks: (nblk_rows,) number of real tiles per row-block.
    n / n_orig: padded (multiple of 128) and original ROW dims.
    n_col / n_col_orig: same for the column dim; -1 means square (defaults
      to the row dims — the common case of a square support).
    """

    data: jnp.ndarray
    cols: jnp.ndarray
    nnz_blocks: jnp.ndarray
    n: int
    n_orig: int
    n_col: int = -1
    n_col_orig: int = -1

    @property
    def col_dim(self):
        return self.n if self.n_col == -1 else self.n_col

    @property
    def col_dim_orig(self):
        return self.n_orig if self.n_col_orig == -1 else self.n_col_orig


def to_block_ell(a: np.ndarray) -> BlockELL:
    """Pack a (possibly non-multiple-of-128, possibly rectangular) dense
    numpy matrix with a sparse pattern into BlockELL."""
    r_orig, c_orig = a.shape
    n = ((r_orig + BLOCK - 1) // BLOCK) * BLOCK
    nc = ((c_orig + BLOCK - 1) // BLOCK) * BLOCK
    ap = np.zeros((n, nc), a.dtype)
    ap[:r_orig, :c_orig] = a
    nblk = n // BLOCK
    ncblk = nc // BLOCK
    tiles = ap.reshape(nblk, BLOCK, ncblk, BLOCK).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > 0  # (nblk, ncblk) block mask
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
                    n, r_orig, nc, c_orig)


def transpose_block_ell(a: np.ndarray) -> BlockELL:
    return to_block_ell(np.ascontiguousarray(a.T))


@jax.tree_util.register_pytree_node_class
class ShardedRoadPacks:
    """Per-device row-partitioned road supports, stacked for shard_map.

    Arrays carry a leading (S, D) = (num_supports, num_node_shards) pair;
    shard_map in_specs split dim 1 over the node axis so each device gets its
    own row-block pack. ``fwd_*`` pack device d's rows A[d] : (n_loc, N);
    ``bwd_*`` pack A[d]^T : (N, n_loc) for the SpMM custom VJP. The dims
    ``n_loc`` (original rows per shard) and ``n_full`` (original node count)
    are static pytree aux data — they define BlockELL shapes at trace time.
    """

    _ARRAYS = ("fwd_data", "fwd_cols", "fwd_nnz",
               "bwd_data", "bwd_cols", "bwd_nnz")

    def __init__(self, fwd_data, fwd_cols, fwd_nnz, bwd_data, bwd_cols,
                 bwd_nnz, n_loc: int, n_full: int):
        self.fwd_data, self.fwd_cols, self.fwd_nnz = (fwd_data, fwd_cols,
                                                      fwd_nnz)
        self.bwd_data, self.bwd_cols, self.bwd_nnz = (bwd_data, bwd_cols,
                                                      bwd_nnz)
        self.n_loc, self.n_full = n_loc, n_full

    def tree_flatten(self):
        return (tuple(getattr(self, k) for k in self._ARRAYS),
                (self.n_loc, self.n_full))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _stack_ragged(packs):
    """Equalize max_blocks across shards, stack (D, ...) arrays."""
    maxb = max(int(p.cols.shape[1]) for p in packs)

    def pad(a, width, axis):
        padw = [(0, 0)] * a.ndim
        padw[axis] = (0, width - a.shape[axis])
        return np.pad(np.asarray(a), padw)

    data = np.stack([pad(p.data, maxb, 1) for p in packs])
    cols = np.stack([pad(p.cols, maxb, 1) for p in packs])
    nnz = np.stack([np.asarray(p.nnz_blocks) for p in packs])
    return data, cols, nnz


def shard_road_packs(supports, n_shards: int) -> ShardedRoadPacks:
    """Row-partition dense numpy supports for the node-sharded Pallas path.

    supports: list of (N, N) numpy arrays (e.g. from
    ``ops.graph.dual_random_walk_supports``). N must divide by n_shards
    (matching the shard_map node-axis split of the activations).
    """
    n = supports[0].shape[0]
    if n % n_shards:
        raise ValueError(f"num_nodes {n} not divisible by {n_shards}")
    n_loc = n // n_shards
    fwd, bwd = [], []
    for s in supports:
        s = np.asarray(s, np.float32)
        rows = [s[d * n_loc:(d + 1) * n_loc, :] for d in range(n_shards)]
        fwd.append(_stack_ragged([to_block_ell(r) for r in rows]))
        bwd.append(_stack_ragged(
            [to_block_ell(np.ascontiguousarray(r.T)) for r in rows]))
    f_data, f_cols, f_nnz = (np.stack([f[i] for f in fwd]) for i in range(3))
    b_data, b_cols, b_nnz = (np.stack([b[i] for b in bwd]) for i in range(3))
    return ShardedRoadPacks(
        jnp.asarray(f_data), jnp.asarray(f_cols), jnp.asarray(f_nnz),
        jnp.asarray(b_data), jnp.asarray(b_cols), jnp.asarray(b_nnz),
        n_loc, n)


def local_packs(sp: ShardedRoadPacks):
    """Inside shard_map (arrays carry a length-1 device dim): rebuild the
    per-support (BlockELL, BlockELL_t) pairs for this device's row block."""
    n_loc_pad = sp.fwd_data.shape[2] * BLOCK
    n_full_pad = sp.bwd_data.shape[2] * BLOCK
    packs = []
    for s in range(sp.fwd_data.shape[0]):
        a = BlockELL(sp.fwd_data[s, 0], sp.fwd_cols[s, 0], sp.fwd_nnz[s, 0],
                     n_loc_pad, sp.n_loc, n_full_pad, sp.n_full)
        a_t = BlockELL(sp.bwd_data[s, 0], sp.bwd_cols[s, 0], sp.bwd_nnz[s, 0],
                       n_full_pad, sp.n_full, n_loc_pad, sp.n_loc)
        packs.append((a, a_t))
    return packs


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
    """x: (col_dim, f) with f a multiple of 128; returns (a.n, f) rows.

    The feature tile is as wide as fits comfortably in VMEM (up to 8 lanes of
    128): each grid program then runs a (128, 128) @ (128, f_blk) MXU matmul
    instead of a square-tile one — at road-graph sparsity the kernel is
    launch/latency-bound, so fewer, fatter programs win.
    """
    _, f = x.shape
    nblk = a.data.shape[0]  # row blocks (may differ from x's col blocks)
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
        out_shape=jax.ShapeDtypeStruct((nblk * BLOCK, f), x.dtype),
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


def _spmm_impl(a: BlockELL, x: jnp.ndarray, interpret) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    n_in, f = x.shape
    if n_in != a.col_dim_orig:
        raise ValueError(f"x has {n_in} rows, pack expects {a.col_dim_orig}")
    xp = jnp.zeros((a.col_dim, f), x.dtype).at[:n_in].set(x)
    xp = _pad_cols(xp, BLOCK)
    y = _spmm_padded(a, xp, interpret)
    return y[:a.n_orig, :f]


# The pack arrays are regular (differentiable-path) arguments so they may be
# tracers — required when per-device packs enter through shard_map in_specs
# (node-partitioned path) rather than as closure constants. The support is a
# structural constant by contract, so its cotangents are zeros (float0 for
# the int index arrays); only the static dims ride nondiff_argnums.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_cv(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x):
    a = BlockELL(*fwd_arrays, *dims)
    return _spmm_impl(a, x, interpret)


def _spmm_cv_fwd(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x):
    # Residuals alias the (loop-invariant) pack arrays — no extra storage;
    # they carry the shapes/dtypes the zero cotangents need.
    return (_spmm_cv(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x),
            (fwd_arrays, bwd_arrays))


def _zero_cotangents(arrays):
    import numpy as _np

    return tuple(
        _np.zeros(a.shape, jax.dtypes.float0)
        if not jnp.issubdtype(a.dtype, jnp.floating) else jnp.zeros_like(a)
        for a in arrays)


def _spmm_cv_bwd(dims, dims_t, interpret, res, g):
    fwd_arrays, bwd_arrays = res
    a_t = BlockELL(*bwd_arrays, *dims_t)
    dx = _spmm_impl(a_t, g, interpret)
    return (_zero_cotangents(fwd_arrays), _zero_cotangents(bwd_arrays), dx)


_spmm_cv.defvjp(_spmm_cv_fwd, _spmm_cv_bwd)


def _dims(a: BlockELL):
    return (a.n, a.n_orig, a.n_col, a.n_col_orig)


def spmm(a: BlockELL, a_t: BlockELL, x: jnp.ndarray,
         interpret=None) -> jnp.ndarray:
    """y = A @ x for a static-pattern sparse A (possibly rectangular).

    a / a_t: forward and transposed BlockELL packs (host-built constants, or
    per-device tracers under shard_map). x: (a.col_dim_orig, f). Returns
    (a.n_orig, f). Gradient flows to x only (dA = 0 — the pattern and values
    are graph constants); interpret=None auto-selects interpreter off-TPU.
    """
    return _spmm_cv(_dims(a), _dims(a_t), interpret,
                    (a.data, a.cols, a.nnz_blocks),
                    (a_t.data, a_t.cols, a_t.nnz_blocks), x)


def spmm_batched(a: BlockELL, a_t: BlockELL, x: jnp.ndarray,
                 interpret=None) -> jnp.ndarray:
    """Batched aggregation ``einsum('nm,bmc->bnc')`` through the kernel:
    (B, m, C) -> fold (B, C) into the feature axis -> one SpMM ->
    (B, a.n_orig, C) (rows may differ from m for rectangular packs)."""
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
    y = spmm(a, a_t, flat, interpret)
    return jnp.transpose(y.reshape(a.n_orig, b, c), (1, 0, 2))
