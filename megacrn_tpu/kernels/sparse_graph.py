"""Differentiable block-sparse graph ops: SDDMM + learned-support SpMM.

The static-pattern Pallas SpMM (``kernels.spmm``) covers constant road
supports. This module covers the LEARNED sparse support: a meta-graph
restricted to a fixed edge-block pattern, where gradients must flow into the
support values themselves. On the block-tile layout every op is a gather +
batched 128x128 dense matmul — exactly what XLA/MXU excels at — so these are
deliberately written as XLA programs rather than Pallas kernels (the FLOPs
saved are the sparsity win; the schedule is already optimal for batched
dense tiles).

Ops:
* ``sddmm_blocks``: tiles[i, r] = E1_blk[i] @ E2_blk[cols[i, r]]^T for the
  nonzero blocks only (sampled dense-dense matmul).
* ``block_row_softmax``: masked softmax over each sparse matrix row stored
  across its block tiles (edge-restricted attention normalisation — NOTE:
  this is a *framework extension*, not reference parity: the reference
  meta-graph softmax runs over all N columns including relu zeros,
  model/MegaCRN.py:171-172).
* ``spmm_blocks``: y = A @ x with A given as (tiles, cols) — differentiable
  in both tiles and x.
* ``sparse_meta_graph``: the composition, producing a learned sparse support.

Pattern layout (shared with kernels.spmm.BlockELL): per row-block i, a list
``cols[i, r]`` of column-block indices (padded by repeating a valid index
with an all-zero mask tile).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 128


class BlockPattern(NamedTuple):
    """Static sparsity pattern at 128x128 tile granularity + entry masks.

    cols: (nblk, R) int32 column-block per tile slot.
    mask: (nblk, R, BLOCK, BLOCK) float 0/1 — which entries inside each tile
      are real edges (structural zeros inside nonzero tiles are masked;
      padded slots are all-zero so they contribute nothing).
    n / n_orig: padded and original node counts.

    No explicit transpose mapping is needed: the VJPs of the gathers in
    ``spmm_blocks``/``sddmm_blocks`` produce the scatter-adds automatically.
    """

    cols: jnp.ndarray
    mask: jnp.ndarray
    n: int
    n_orig: int


def build_block_pattern(adj: np.ndarray) -> BlockPattern:
    """Build the tile pattern (and its transpose mapping) from a 0/1 numpy
    adjacency; apply ``kernels.spmm.rcm_ordering`` first for locality."""
    n_orig = adj.shape[0]
    n = ((n_orig + BLOCK - 1) // BLOCK) * BLOCK
    ap = np.zeros((n, n), np.float32)
    ap[:n_orig, :n_orig] = (np.asarray(adj) != 0).astype(np.float32)
    nblk = n // BLOCK
    tiles = ap.reshape(nblk, BLOCK, nblk, BLOCK).transpose(0, 2, 1, 3)
    nz = tiles.sum(axis=(2, 3)) > 0
    r_max = max(1, int(nz.sum(1).max()))
    cols = np.zeros((nblk, r_max), np.int32)
    mask = np.zeros((nblk, r_max, BLOCK, BLOCK), np.float32)
    for i in range(nblk):
        cs = np.nonzero(nz[i])[0]
        for r, j in enumerate(cs):
            cols[i, r] = j
            mask[i, r] = tiles[i, j]
        cols[i, len(cs):] = cs[0] if len(cs) else 0
    return BlockPattern(jnp.asarray(cols), jnp.asarray(mask), n, n_orig)


def _pad_nodes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = n - x.shape[0]
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def sddmm_blocks(e1: jnp.ndarray, e2: jnp.ndarray, pattern: BlockPattern
                 ) -> jnp.ndarray:
    """tiles[i, r] = E1_blk[i] @ E2_blk[cols[i, r]]^T (masked).

    e1, e2: (N, d). Returns (nblk, R, BLOCK, BLOCK).
    """
    e1 = _pad_nodes(e1, pattern.n).reshape(-1, BLOCK, e1.shape[-1])
    e2 = _pad_nodes(e2, pattern.n).reshape(-1, BLOCK, e2.shape[-1])
    e2_g = e2[pattern.cols]  # (nblk, R, BLOCK, d)
    tiles = jnp.einsum("ibk,irck->irbc", e1, e2_g)
    return tiles * pattern.mask


def spmm_blocks(tiles: jnp.ndarray, pattern: BlockPattern, x: jnp.ndarray
                ) -> jnp.ndarray:
    """y = A @ x with A = (tiles, pattern); differentiable in tiles and x.

    x: (N, f) -> (N, f). Autodiff produces the transpose-SpMM for dx and the
    SDDMM-shaped product for dtiles automatically (both are gathers +
    batched matmuls — XLA handles the scatter-add from the gather VJP).
    """
    n_orig, f = x.shape
    xp = _pad_nodes(x, pattern.n).reshape(-1, BLOCK, f)  # (nblk, BLOCK, f)
    x_g = xp[pattern.cols]  # (nblk, R, BLOCK, f)
    y = jnp.einsum("irbc,ircf->ibf", tiles, x_g)  # sum over slots + cols
    return y.reshape(pattern.n, f)[:n_orig]


def block_row_softmax(tiles: jnp.ndarray, pattern: BlockPattern,
                      scale: float = 1.0) -> jnp.ndarray:
    """Masked softmax over each matrix row spanning its nonzero tiles.

    Non-edge entries (mask 0) get probability 0; rows with no edges yield 0.
    """
    neg = jnp.finfo(tiles.dtype).min
    z = jnp.where(pattern.mask > 0, tiles * scale, neg)
    row_max = jnp.max(z, axis=(1, 3), keepdims=True)  # over slots and cols
    e = jnp.exp(z - jnp.maximum(row_max, neg / 2)) * pattern.mask
    denom = jnp.sum(e, axis=(1, 3), keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def sparse_meta_graph(memory: jnp.ndarray, we1: jnp.ndarray,
                      we2: jnp.ndarray, pattern: BlockPattern
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-restricted learned supports: the meta-graph hypernetwork
    (model/MegaCRN.py:168-173) evaluated only on a static edge pattern, with
    softmax over each row's edges. Returns (tiles_g1, tiles_g2) usable with
    ``spmm_blocks`` — the scalable-N mode of the framework."""
    e1 = we1 @ memory
    e2 = we2 @ memory
    t1 = jax.nn.relu(sddmm_blocks(e1, e2, pattern))
    t2 = jax.nn.relu(sddmm_blocks(e2, e1, pattern))
    return (block_row_softmax(t1, pattern), block_row_softmax(t2, pattern))


def cheb_aggregate_learned_sparse(supports_tiles, pattern: BlockPattern,
                                  x: jnp.ndarray, cheb_k: int) -> jnp.ndarray:
    """Chebyshev stack (reference order) over learned sparse supports.

    supports_tiles: sequence of tile arrays; x: (B, N, C).
    """
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)

    def apply(tiles, v):
        return spmm_blocks(tiles, pattern, v)

    terms = []
    for tiles in supports_tiles:
        t_prev, t_cur = flat, apply(tiles, flat)
        terms.append(t_prev)
        terms.append(t_cur)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, 2.0 * apply(tiles, t_cur) - t_prev
            terms.append(t_cur)
    stack = jnp.stack(terms, axis=1)  # (N, S*K, B*C)
    stack = stack.reshape(n, len(terms), b, c)
    return jnp.transpose(stack, (2, 0, 1, 3))  # (B, N, S*K, C)
