"""Node-level ELL SpMM — the gather-based road-graph path for ultra-sparse
graphs.

Why a third sparse layout: the 128x128 *tile*-granular packs (block-ELL
`kernels/spmm.py`, block-COO `kernels/spmm_coo.py`) are the wrong shape for
road graphs at scale — a degree-~6 graph with non-local edges puts ~1 edge
per touched tile, so tile count (and therefore pack bytes and MXU work)
scales like *edges*, each padded 16384x: at N=32768 the block-COO pack hit
84,024 tiles = 2.6 GB bf16 for ~400k real edges and OOM'd HBM
(round-3 measurement), and at N=8192 it ran 2x SLOWER than dense while
doing ~1300x fewer edge-FLOPs.

Node-level ELL instead pads each ROW to the graph's max degree D:

  nbr: (R, D) int32 neighbor ids, w: (R, D) edge weights (0 at pads)
  y[r] = sum_d w[r, d] * x[nbr[r, d]]

The forward is a pure gather + weighted reduce — dense, regular, scatter-free
ops XLA lowers well on TPU; pack bytes are O(N*D) (vs O(tiles*16384));
padding waste is bounded by max-degree/mean-degree (small for road graphs,
and hub rows cost D slots, not a dense 128-row block). The backward avoids
XLA scatter entirely: dx = A^T @ dy through the TRANSPOSED node-ELL pack via
custom VJP (the same trick as the tile kernels); pack arrays ride the
differentiable path with zero cotangents so they may be traced as runtime
args.

The Chebyshev recursion over S supports runs on ONE stacked pack
(block-diagonal semantics via per-support column offsets), exactly like
``stack_supports_block_coo``.

Reference provenance: this replaces the aggregation at ``model/MegaCRN.py:
24-25`` for static road supports (the learned meta-graph is bypassed, as in
the other road_sparse impls).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NodeELL(NamedTuple):
    """Row-padded neighbor lists of a sparse matrix (possibly rectangular).

    nbr/w: (n_rows, D) int32 / float32; pads have w == 0 and nbr == 0.
    n_cols: number of columns of the ORIGINAL matrix (gather source length).
    """

    nbr: jnp.ndarray
    w: jnp.ndarray
    n_cols: int


class StackedNodeELL(NamedTuple):
    """Stacked block-diagonal ``diag(A_1..A_S)`` node-ELL pack (+ transpose
    for the VJP). Column ids in ``pack`` are offset by ``s * n`` so the
    Chebyshev recursion runs on (S*n, F) stacked features in ONE gather."""

    pack: NodeELL
    pack_t: NodeELL
    num_supports: int
    n: int  # per-support node count (no 128-padding needed at node level)


def _to_node_ell(rows, cols, vals, n_rows, n_cols):
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_rows)
    d = max(1, int(counts.max()))
    nbr = np.zeros((n_rows, d), np.int32)
    w = np.zeros((n_rows, d), np.float32)
    slot = np.concatenate([np.arange(c) for c in counts]) if len(rows) else \
        np.zeros((0,), np.int64)
    nbr[rows, slot] = cols
    w[rows, slot] = vals
    return NodeELL(jnp.asarray(nbr), jnp.asarray(w), n_cols)


def build_stacked_node_ell(supports) -> StackedNodeELL:
    """supports: list of (N, N) numpy arrays (dual_random_walk_supports of
    the road adjacency). Builds stacked fwd + transposed packs WITHOUT ever
    materialising a block-diagonal dense matrix (O(nnz) host memory — the
    dense builder needed 78 GB at N=32768)."""
    sups = [np.asarray(s, np.float32) for s in supports]
    n = sups[0].shape[0]
    s_num = len(sups)
    rf, cf, vf = [], [], []
    rt, ct, vt = [], [], []
    for i, a in enumerate(sups):
        r, c = np.nonzero(a)
        v = a[r, c]
        rf.append(r + i * n)
        cf.append(c + i * n)
        vf.append(v)
        rt.append(c + i * n)  # transpose
        ct.append(r + i * n)
        vt.append(v)
    cat = lambda xs: np.concatenate(xs)
    fwd = _to_node_ell(cat(rf), cat(cf), cat(vf), s_num * n, s_num * n)
    bwd = _to_node_ell(cat(rt), cat(ct), cat(vt), s_num * n, s_num * n)
    return StackedNodeELL(fwd, bwd, s_num, n)


def _ell_apply(nbr, w, x):
    """y = sum_d w[:, d] * x[nbr[:, d]] — gather + weighted reduce."""
    g = x[nbr]  # (R, D, F)
    return jnp.einsum("rd,rdf->rf", w.astype(x.dtype), g,
                      preferred_element_type=x.dtype)


@jax.custom_vjp
def spmm_node_ell(nbr, w, nbr_t, w_t, x):
    return _ell_apply(nbr, w, x)


def _spmm_fwd(nbr, w, nbr_t, w_t, x):
    return _ell_apply(nbr, w, x), (nbr_t, w_t)


def _spmm_bwd(res, dy):
    nbr_t, w_t = res
    # dx = A^T @ dy through the transposed pack: gather-based, no scatter.
    dx = _ell_apply(nbr_t, w_t, dy)
    zero = lambda a: jnp.zeros_like(a)
    return (zero(nbr_t), zero(w_t), zero(nbr_t), zero(w_t), dx)


spmm_node_ell.defvjp(_spmm_fwd, _spmm_bwd)


def cheb_aggregate_node_ell(packs: StackedNodeELL, x: jnp.ndarray,
                            cheb_k: int) -> jnp.ndarray:
    """Chebyshev feature stack over static sparse supports via the stacked
    node-ELL pack. Output layout identical to ``ops.graph.cheb_aggregate``:
    (B, N, S*K, C), support-major ``[I, A, T2(A), ...]``."""
    s_num, n = packs.num_supports, packs.n
    b, n_in, c = x.shape
    if n_in != n:
        raise ValueError(f"x has {n_in} nodes, pack expects {n}")
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
    x_stack = jnp.tile(flat, (s_num, 1))  # (S*n, F)
    apply = lambda v: spmm_node_ell(packs.pack.nbr, packs.pack.w,
                                    packs.pack_t.nbr, packs.pack_t.w, v)
    levels = [None]
    t_prev, t_cur = x_stack, apply(x_stack)
    levels.append(t_cur)
    for _ in range(2, cheb_k):
        t_prev, t_cur = t_cur, 2.0 * apply(t_cur) - t_prev
        levels.append(t_cur)
    terms = []
    for s in range(s_num):
        for k in range(cheb_k):
            terms.append(flat if k == 0 else levels[k][s * n:(s + 1) * n])
    stack = jnp.stack(terms, 1)  # (N, S*K, F)
    return jnp.transpose(stack.reshape(n, s_num * cheb_k, b, c),
                         (2, 0, 1, 3))
