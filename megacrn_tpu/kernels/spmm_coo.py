"""Flattened block-COO Pallas SpMM — the padding-free road-graph kernel.

Why a second layout: the Block-ELL kernel (``kernels.spmm``) pads EVERY
row-block to the maximum tiles-per-row, so one hub row-block (common in road
graphs — e.g. 14 of 15 column blocks at EXPY-TKY N=1843) drags the whole grid
to near-dense work: measured 251 ms/step vs 113 ms dense f32 on v5e. This
kernel flattens the nonzero tiles into one sorted (row, col, data) list and
grids over ACTUAL tiles only:

  grid = (f_tiles, n_tiles); for each feature stripe j, sweep tiles t in
  row-major order, accumulating ``data[t] @ x[cols[t]]`` in VMEM and flushing
  to output row-block ``rows[t]`` when the row index changes. The output
  BlockSpec revisits the same block across consecutive t (Mosaic keeps it in
  VMEM until the index map moves — rows are sorted, so the map is
  nondecreasing).

Every row-block must own >= 1 tile so its output gets written;
``to_block_coo`` inserts an all-zero tile into empty row-blocks.

The second structural win lives in ``stack_supports_block_coo``: the model's
Chebyshev recursion over S supports is a recursion on BLOCK-DIAGONAL
``diag(A_1 .. A_S)`` applied to stacked features — one kernel invocation per
Chebyshev level instead of S, with no extra FLOPs (the diagonal blocks are
the only tiles). See ``ops.graph.cheb_aggregate_sparse_stacked``.

Gradient: d/dx = A^T @ g via the transposed pack through the same kernel
(custom VJP; pack arrays ride the differentiable path with zero/float0
cotangents so they may be shard_map-traced, matching ``kernels.spmm``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from megacrn_tpu.kernels.spmm import BLOCK, _auto_interpret, _pad_cols


class BlockCOO(NamedTuple):
    """Sorted flattened block-COO sparse matrix (possibly rectangular).

    rows / cols: (T,) int32 row/column BLOCK indices per tile, sorted by row
      (ties by col). Every row-block of the padded matrix appears at least
      once (empty rows carry one all-zero tile).
    data: (T, BLOCK, BLOCK) tile values.
    n / n_orig: padded and original ROW dims; n_col / n_col_orig: column dims
      (-1 = square).
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    data: jnp.ndarray
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


def to_block_coo(a: np.ndarray) -> BlockCOO:
    """Pack a dense numpy matrix with a sparse pattern into sorted BlockCOO
    (row-major tile order, one zero tile inserted per empty row-block)."""
    r_orig, c_orig = a.shape
    n = ((r_orig + BLOCK - 1) // BLOCK) * BLOCK
    nc = ((c_orig + BLOCK - 1) // BLOCK) * BLOCK
    ap = np.zeros((n, nc), np.float32)
    ap[:r_orig, :c_orig] = a
    nblk, ncblk = n // BLOCK, nc // BLOCK
    tiles = ap.reshape(nblk, BLOCK, ncblk, BLOCK).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > 0  # (nblk, ncblk)
    rows, cols, data = [], [], []
    for i in range(nblk):
        cs = np.nonzero(nz[i])[0]
        if len(cs) == 0:
            cs = [0]  # zero tile keeps the output row-block written
        for c in cs:
            rows.append(i)
            cols.append(int(c))
            data.append(tiles[i, c])
    return BlockCOO(jnp.asarray(np.asarray(rows, np.int32)),
                    jnp.asarray(np.asarray(cols, np.int32)),
                    jnp.asarray(np.stack(data)), n, r_orig, nc, c_orig)


def transpose_block_coo(a: np.ndarray) -> BlockCOO:
    return to_block_coo(np.ascontiguousarray(a.T))


class StackedRoadPack(NamedTuple):
    """The production road-graph constant: block-diagonal ``diag(A_1..A_S)``
    COO packs (+ transpose for the VJP) and the static dims the stacked
    Chebyshev recursion needs. Built host-side (``build_stacked_road_pack``),
    closed over as a jit constant.

    ``impl`` selects the SpMM execution strategy:
    * ``'xla'`` — gather x tiles, ONE batched (T,128,128)@(T,128,f) einsum,
      scatter-add rows (f32 accumulate). One fused XLA op chain; the right
      choice when tile count is modest (N up to a few thousand), where a
      per-tile Pallas grid is launch/latency-bound.
    * ``'pallas'`` — the explicit Mosaic kernel (``spmm_coo``): streaming
      accumulate-until-row-change; the scalable choice when tiles no longer
      fit the batched-einsum intermediate in HBM.
    """

    pack: "BlockCOO"
    pack_t: "BlockCOO"
    num_supports: int
    n_pad: int  # per-support padded node count (slice stride in the stack)
    impl: str = "xla"


# impl='auto' threshold, in nonzero 128x128 tiles of the block-diagonal
# pack. TPU-measured at the EXPY-TKY shapes (tools/backend_bench.json): the
# Mosaic kernel runs ~1.8x faster than the XLA gather-einsum-scatter chain
# at N=1843 (167 vs 307 ms/step) but costs a multi-minute remote Mosaic
# compile (~1000 s at N=2841; amortised by the persistent compilation
# cache). Below this tile count the pack is test/small-graph sized: the XLA
# chain compiles in seconds and the per-tile grid would be launch-bound.
AUTO_PALLAS_MIN_TILES = 96


def build_stacked_road_pack(supports, impl: str = "auto") -> StackedRoadPack:
    """supports: list of (N, N) numpy arrays (e.g. dual_random_walk_supports
    of the road adjacency). ``impl='auto'`` picks 'pallas' for production-
    sized packs (>= AUTO_PALLAS_MIN_TILES tiles) and 'xla' for small ones."""
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown road SpMM impl {impl!r}")
    n_orig = supports[0].shape[0]
    n_pad = ((n_orig + BLOCK - 1) // BLOCK) * BLOCK
    fwd, bwd = stack_supports_block_coo(supports)
    if impl == "auto":
        impl = ("pallas" if fwd.rows.shape[0] >= AUTO_PALLAS_MIN_TILES
                else "xla")
    return StackedRoadPack(fwd, bwd, len(supports), n_pad, impl)


def spmm_coo_xla(a: BlockCOO, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x as a pure XLA program over the COO tiles: gather the
    referenced x tiles, one batched MXU einsum over all tiles, scatter-add
    into row blocks (f32 accumulator). Differentiable in x automatically
    (gather <-> scatter-add transposes); A is a constant."""
    n_in, f = x.shape
    if n_in != a.col_dim_orig:
        raise ValueError(f"x has {n_in} rows, pack expects {a.col_dim_orig}")
    xp = jnp.zeros((a.col_dim, f), x.dtype).at[:n_in].set(x)
    x_tiles = xp.reshape(a.col_dim // BLOCK, BLOCK, f)
    x_g = x_tiles[a.cols]  # (T, BLOCK, f)
    y_t = jnp.einsum("tbc,tcf->tbf", a.data, x_g,
                     preferred_element_type=jnp.float32)
    y = jnp.zeros((a.n // BLOCK, BLOCK, f), jnp.float32).at[a.rows].add(y_t)
    return y.reshape(a.n, f)[:a.n_orig].astype(x.dtype)


def stack_supports_block_coo(supports) -> tuple:
    """(fwd, bwd) BlockCOO packs of ``diag(A_1 .. A_S)`` for the stacked
    Chebyshev recursion. supports: list of (N, N) numpy arrays. Each A_s is
    padded to a BLOCK multiple independently so stacked feature rows align
    with per-support slices of the padded stack."""
    sups = [np.asarray(s, np.float32) for s in supports]
    n_orig = sups[0].shape[0]
    n = ((n_orig + BLOCK - 1) // BLOCK) * BLOCK
    big = np.zeros((n * len(sups), n * len(sups)), np.float32)
    for i, s in enumerate(sups):
        big[i * n:i * n + n_orig, i * n:i * n + n_orig] = s
    return to_block_coo(big), transpose_block_coo(big)


def _spmm_coo_kernel(rows_ref, cols_ref, data_ref, x_ref, o_ref, acc_ref):
    """Grid (f_tiles, n_tiles), tiles innermost. Accumulate data[t] @ x-tile
    until the (sorted) row index changes, then flush to the output block."""
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    row = rows_ref[t]
    prev = rows_ref[jnp.maximum(t - 1, 0)]

    @pl.when(jnp.logical_or(t == 0, row != prev))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(data_ref[0], x_ref[:],
                          preferred_element_type=jnp.float32)

    nxt = rows_ref[jnp.minimum(t + 1, nt - 1)]

    @pl.when(jnp.logical_or(t == nt - 1, nxt != row))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _spmm_coo_padded(rows, cols, data, n_rows_pad, x, interpret):
    """x: (col_dim_pad, f), f a multiple of BLOCK; returns (n_rows_pad, f)."""
    _, f = x.shape
    n_tiles = data.shape[0]
    f_blk = min(f, 4 * BLOCK)
    pad = (-f) % f_blk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        f = x.shape[1]
    f_tiles = f // f_blk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows, cols
        grid=(f_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda j, t, rows, cols: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, f_blk),
                         lambda j, t, rows, cols: (cols[t], j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, f_blk),
                               lambda j, t, rows, cols: (rows[t], j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLOCK, f_blk), jnp.float32)],
    )
    return pl.pallas_call(
        _spmm_coo_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, f), x.dtype),
        interpret=interpret,
    )(rows, cols, data, x)


def _spmm_coo_impl(a: BlockCOO, x: jnp.ndarray, interpret) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    n_in, f = x.shape
    if n_in != a.col_dim_orig:
        raise ValueError(f"x has {n_in} rows, pack expects {a.col_dim_orig}")
    xp = jnp.zeros((a.col_dim, f), x.dtype).at[:n_in].set(x)
    xp = _pad_cols(xp, BLOCK)
    y = _spmm_coo_padded(a.rows, a.cols, a.data, a.n, xp, interpret)
    return y[:a.n_orig, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_coo_cv(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x):
    a = BlockCOO(*fwd_arrays, *dims)
    return _spmm_coo_impl(a, x, interpret)


def _coo_cv_fwd(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x):
    return (_spmm_coo_cv(dims, dims_t, interpret, fwd_arrays, bwd_arrays, x),
            (fwd_arrays, bwd_arrays))


def _zero_cotangents(arrays):
    return tuple(
        np.zeros(a.shape, jax.dtypes.float0)
        if not jnp.issubdtype(a.dtype, jnp.floating) else jnp.zeros_like(a)
        for a in arrays)


def _coo_cv_bwd(dims, dims_t, interpret, res, g):
    fwd_arrays, bwd_arrays = res
    a_t = BlockCOO(*bwd_arrays, *dims_t)
    dx = _spmm_coo_impl(a_t, g, interpret)
    return (_zero_cotangents(fwd_arrays), _zero_cotangents(bwd_arrays), dx)


_spmm_coo_cv.defvjp(_coo_cv_fwd, _coo_cv_bwd)


def _dims(a: BlockCOO):
    return (a.n, a.n_orig, a.n_col, a.n_col_orig)


def spmm_coo(a: BlockCOO, a_t: BlockCOO, x: jnp.ndarray,
             interpret=None) -> jnp.ndarray:
    """y = A @ x for a static-pattern sparse A in sorted block-COO form.

    x: (a.col_dim_orig, f) -> (a.n_orig, f). Gradient flows to x only
    (dA = 0); interpret=None auto-selects interpreter mode off-TPU.
    """
    return _spmm_coo_cv(_dims(a), _dims(a_t), interpret,
                        (a.rows, a.cols, a.data),
                        (a_t.rows, a_t.cols, a_t.data), x)
