"""Node-granular differentiable sparse graph ops: SDDMM + learned SpMM.

The tile-granular learned path (``kernels.sparse_graph``) stores its pattern
as 128x128 blocks — the same layout whose tile count explodes on
scatter-sparse road graphs (see ``kernels/spmm_ell_node.py``); at N=1843
B=64 its mask tiles alone forced ``--remat`` to fit HBM. This module is the
node-level ELL re-design of the LEARNED path: every op works at (row,
neighbor-slot) granularity, so pattern bytes are O(nnz) and the only
activations the VJPs retain are the (N, D) edge weights and the (N, F)
features — no block masks, no remat needed.

Ops (all scatter-free gathers + reduces — the layout XLA lowers well on
TPU; gradients flow into the edge weights AND the node embeddings):

* ``sddmm_node``: scores[r, d] = e1[r] . e2[nbr[r, d]] on the edge slots
  only (sampled dense-dense product). Plain XLA autodiff: the gather
  transpose contributes the scatter-add for d_e2 (small: N x D x dim).
* ``node_row_softmax``: masked softmax over each row's valid slots
  (edge-restricted attention normalisation — framework extension, not
  reference parity: the reference meta-graph softmax spans all N columns
  including relu zeros, model/MegaCRN.py:171-172; equality holds under a
  complete pattern, which the tests assert).
* ``spmm_node``: y[r] = sum_d w[r, d] * x[nbr[r, d]] with a custom VJP
  that is scatter-free on BOTH inputs: dx rides the transposed pattern
  (whose values are the forward weights gathered via a precomputed
  slot map), dw is the SDDMM-shaped dy . x[nbr] product.
* ``sparse_meta_graph_node`` / ``cheb_aggregate_learned_node``: the
  composition — the learned sparse support of the meta-graph hypernetwork
  (model/MegaCRN.py:168-173) and the Chebyshev feature stack in the
  reference concat order (model/MegaCRN.py:17-26).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NodeELLPattern(NamedTuple):
    """Static edge pattern as row-padded neighbor lists + transpose map.

    nbr/mask: (N, D) int32 / float32 — column id per slot, 1 on real edges
      (pads point at column 0 with mask 0).
    t_nbr/t_slot/t_mask: (N, Dt) — the TRANSPOSED pattern: row c of the
      transpose lists the source rows r of edges (r, c), and ``t_slot``
      holds each edge's flat index r*D+d into the forward (N, D) value
      array, so the transposed WEIGHTS of a learned support are one gather
      ``w.reshape(-1)[t_slot] * t_mask`` away (no scatter).
    n_orig: node count (no padding at node granularity).
    """

    nbr: jnp.ndarray
    mask: jnp.ndarray
    t_nbr: jnp.ndarray
    t_slot: jnp.ndarray
    t_mask: jnp.ndarray
    n_orig: int


def _slots(counts):
    return (np.concatenate([np.arange(c) for c in counts])
            if counts.sum() else np.zeros((0,), np.int64))


def build_node_pattern(adj: np.ndarray) -> NodeELLPattern:
    """Build the node-level pattern (+ transpose slot map) from a 0/1 numpy
    adjacency. O(nnz) host work and pack bytes."""
    a = np.asarray(adj) != 0
    n = a.shape[0]
    rows, cols = np.nonzero(a)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    counts = np.bincount(rows, minlength=n)
    d = max(1, int(counts.max()))
    nbr = np.zeros((n, d), np.int32)
    mask = np.zeros((n, d), np.float32)
    slot = _slots(counts)
    nbr[rows, slot] = cols
    mask[rows, slot] = 1.0
    flat = rows.astype(np.int64) * d + slot  # edge position in w.reshape(-1)

    t_order = np.lexsort((rows, cols))
    tr, tc, tf = cols[t_order], rows[t_order], flat[t_order]
    t_counts = np.bincount(tr, minlength=n)
    dt = max(1, int(t_counts.max()))
    t_nbr = np.zeros((n, dt), np.int32)
    t_slot = np.zeros((n, dt), np.int32)
    t_mask = np.zeros((n, dt), np.float32)
    ts = _slots(t_counts)
    t_nbr[tr, ts] = tc
    t_slot[tr, ts] = tf
    t_mask[tr, ts] = 1.0
    return NodeELLPattern(jnp.asarray(nbr), jnp.asarray(mask),
                          jnp.asarray(t_nbr), jnp.asarray(t_slot),
                          jnp.asarray(t_mask), n)


def sddmm_node(e1: jnp.ndarray, e2: jnp.ndarray, nbr: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """scores[r, d] = e1[r] . e2[nbr[r, d]] (masked). e1/e2: (N, dim)."""
    g = e2[nbr]  # (N, D, dim)
    return jnp.einsum("rk,rdk->rd", e1, g,
                      preferred_element_type=e1.dtype) * mask


def node_row_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked softmax over each row's valid slots; empty rows yield 0."""
    neg = jnp.finfo(scores.dtype).min
    z = jnp.where(mask > 0, scores, neg)
    row_max = jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z - jnp.maximum(row_max, neg / 2)) * mask
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, jnp.asarray(1e-30, scores.dtype))


@jax.custom_vjp
def spmm_node(nbr, mask, t_nbr, t_slot, t_mask, w, x):
    """y[r] = sum_d w[r, d] * x[nbr[r, d]] — differentiable in w AND x,
    scatter-free in both directions. w: (N, D); x: (N, F) -> (N, F)."""
    g = x[nbr]  # (N, D, F)
    return jnp.einsum("rd,rdf->rf", w, g, preferred_element_type=x.dtype)


def _spmm_node_fwd(nbr, mask, t_nbr, t_slot, t_mask, w, x):
    y = spmm_node(nbr, mask, t_nbr, t_slot, t_mask, w, x)
    return y, (nbr, mask, t_nbr, t_slot, t_mask, w, x)


def _spmm_node_bwd(res, dy):
    nbr, mask, t_nbr, t_slot, t_mask, w, x = res
    # dx = A^T @ dy: the transposed pattern's values are the forward
    # weights gathered through the precomputed slot map — pure gathers.
    w_t = w.reshape(-1)[t_slot] * t_mask.astype(w.dtype)
    dx = jnp.einsum("cd,cdf->cf", w_t, dy[t_nbr],
                    preferred_element_type=dy.dtype)
    # dw = SDDMM(dy, x) on the pattern slots.
    dw = jnp.einsum("rf,rdf->rd", dy, x[nbr],
                    preferred_element_type=dy.dtype) * mask.astype(dy.dtype)
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zero = lambda a: jnp.zeros_like(a)
    return (int_zero(nbr), zero(mask), int_zero(t_nbr), int_zero(t_slot),
            zero(t_mask), dw, dx)


spmm_node.defvjp(_spmm_node_fwd, _spmm_node_bwd)


def sparse_meta_graph_node(memory: jnp.ndarray, we1: jnp.ndarray,
                           we2: jnp.ndarray, pattern: NodeELLPattern
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-restricted learned supports at node granularity: the meta-graph
    hypernetwork (model/MegaCRN.py:168-173) evaluated on the pattern slots
    only, row-softmax over each row's edges. Returns (w1, w2), both (N, D),
    usable with ``spmm_node``/``cheb_aggregate_learned_node``."""
    e1 = we1 @ memory
    e2 = we2 @ memory
    s1 = jax.nn.relu(sddmm_node(e1, e2, pattern.nbr, pattern.mask))
    s2 = jax.nn.relu(sddmm_node(e2, e1, pattern.nbr, pattern.mask))
    return (node_row_softmax(s1, pattern.mask),
            node_row_softmax(s2, pattern.mask))


def cheb_aggregate_learned_node(weights, pattern: NodeELLPattern,
                                x: jnp.ndarray, cheb_k: int) -> jnp.ndarray:
    """Chebyshev stack (reference order, model/MegaCRN.py:17-26) over
    learned node-ELL supports. weights: sequence of (N, D) arrays;
    x: (B, N, C) -> (B, N, S*K, C)."""
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)

    def apply(w, v):
        return spmm_node(pattern.nbr, pattern.mask.astype(v.dtype),
                         pattern.t_nbr, pattern.t_slot,
                         pattern.t_mask.astype(v.dtype), w, v)

    terms = []
    for w in weights:
        t_prev, t_cur = flat, apply(w, flat)
        terms.append(t_prev)
        terms.append(t_cur)
        for _ in range(2, cheb_k):
            t_prev, t_cur = t_cur, 2.0 * apply(w, t_cur) - t_prev
            terms.append(t_cur)
    stack = jnp.stack(terms, axis=1)  # (N, S*K, B*C)
    return jnp.transpose(stack.reshape(n, len(terms), b, c), (2, 0, 1, 3))
