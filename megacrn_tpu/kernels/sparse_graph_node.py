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


def build_node_pattern(adj: np.ndarray, max_buckets: int = 4,
                       min_saving: float = 0.10):
    """Build the node-level pattern (+ transpose slot map) from a 0/1 numpy
    adjacency. O(nnz) host work and pack bytes.

    When degree-bucketing saves at least ``min_saving`` of the padded
    slots, returns a ``BucketedNodeELLPattern`` (the same 30-46% gather-
    traffic win measured for the static node-ELL packs); otherwise the
    flat ``NodeELLPattern``. ``max_buckets=1`` forces the flat layout."""
    if max_buckets > 1:
        from megacrn_tpu.kernels.spmm_ell_node import _bucket_splits

        # The savings estimate covers BOTH pattern sides: the forward pack
        # buckets by out-degree, the transposed pack (the VJP's dx path) by
        # in-degree — on asymmetric patterns their savings differ, so the
        # threshold decision sums the real slot totals of both.
        a = np.asarray(adj) != 0
        flat_slots = 0
        best_slots = 0
        for counts in (np.bincount(np.nonzero(a)[0], minlength=a.shape[0]),
                       np.bincount(np.nonzero(a)[1], minlength=a.shape[0])):
            flat_slots += len(counts) * max(1, int(counts.max()))
            s, _ = _bucket_splits(np.sort(counts), max_buckets)
            best_slots += s
        if best_slots <= (1.0 - min_saving) * flat_slots:
            return build_node_pattern_bucketed(adj, max_buckets)
    else:
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


class BucketedNodeELLPattern(NamedTuple):
    """Degree-bucketed edge pattern for the LEARNED sparse path.

    Same idea as ``kernels.spmm_ell_node.BucketedStackedNodeELL`` (rows
    sorted by degree, each bucket padded only to its own max — road-graph
    flat packs waste 36-42% of gather slots on padding), but carrying the
    extra structure the learned path needs: per-bucket original ``rows``
    ids (so SDDMM can gather e1 rows) and a transpose slot map whose
    indices address the CONCATENATED per-bucket flat weight layout (so the
    VJP's dx stays scatter-free with runtime weights).

    Per-bucket tuples (sorted-row order): nbr/mask (n_b, D_b), rows (n_b,).
    inv: (N,) — y_original = concat(per-bucket outputs)[inv].
    Transpose side: t_nbr/t_slot/t_mask per-bucket tuples + t_inv, with
    ``t_slot`` flat indices into concat_b(w_b.reshape(-1)).
    """

    nbr: tuple
    mask: tuple
    rows: tuple
    inv: jnp.ndarray
    t_nbr: tuple
    t_slot: tuple
    t_mask: tuple
    t_inv: jnp.ndarray
    n_orig: int


def build_node_pattern_bucketed(adj: np.ndarray,
                                max_buckets: int = 4) -> BucketedNodeELLPattern:
    """Bucketed variant of ``build_node_pattern`` (same 0/1 adjacency in)."""
    from megacrn_tpu.kernels.spmm_ell_node import _bucket_splits

    a = np.asarray(adj) != 0
    n = a.shape[0]
    rows, cols = np.nonzero(a)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]

    def bucketize(r, c, payload):
        """r sorted-major; payload (len(r),) carried into the slot arrays.
        Returns (nbr_t, payload_t, mask_t, rows_t tuples, inv, flat_offsets
        per original row/slot)."""
        counts = np.bincount(r, minlength=n)
        order_rows = np.argsort(counts, kind="stable")
        deg_sorted = counts[order_rows]
        _, cut_ends = _bucket_splits(deg_sorted, max_buckets)
        rank = np.empty(n, np.int64)
        rank[order_rows] = np.arange(n)
        # r is sorted, so slot positions are simple run offsets.
        idx = np.arange(len(r))
        if len(r):
            change = np.concatenate([[True], r[1:] != r[:-1]])
            run_start = np.maximum.accumulate(np.where(change, idx, 0))
            slot = idx - run_start
        else:
            slot = idx
        starts = np.concatenate([[0], np.asarray(cut_ends[:-1])])
        d_bs = [max(1, int(deg_sorted[end - 1])) for end in cut_ends]
        nbrs, masks, rows_ids, pay = [], [], [], []
        # flat offset of each bucket's value block in concat(w_b.ravel())
        flat_off = np.concatenate(
            [[0], np.cumsum([(e - s) * d
                             for s, e, d in zip(starts, cut_ends, d_bs)])])
        bucket_of = np.searchsorted(np.asarray(cut_ends), rank[r],
                                    side="right")
        local_row = rank[r] - starts[bucket_of]
        # flat index of every edge's (sorted) slot in the concat layout
        edge_flat = (flat_off[bucket_of] +
                     local_row * np.asarray(d_bs)[bucket_of] + slot)
        for b, (s, e, d_b) in enumerate(zip(starts, cut_ends, d_bs)):
            m = bucket_of == b
            nbr_b = np.zeros((e - s, d_b), np.int32)
            mask_b = np.zeros((e - s, d_b), np.float32)
            pay_b = np.zeros((e - s, d_b), np.int32)
            nbr_b[local_row[m], slot[m]] = c[m]
            mask_b[local_row[m], slot[m]] = 1.0
            if payload is not None:
                pay_b[local_row[m], slot[m]] = payload[m]
            nbrs.append(jnp.asarray(nbr_b))
            masks.append(jnp.asarray(mask_b))
            pay.append(jnp.asarray(pay_b))
            rows_ids.append(jnp.asarray(
                order_rows[s:e].astype(np.int32)))
        inv = jnp.asarray(rank.astype(np.int32))
        return (tuple(nbrs), tuple(masks), tuple(rows_ids), tuple(pay),
                inv, edge_flat)

    f_nbr, f_mask, f_rows, _, f_inv, edge_flat = bucketize(rows, cols, None)
    # Transpose: edge (r, c) lives in t-row c; its t_slot points at the
    # edge's flat position in the FORWARD concat weight layout.
    t_order = np.lexsort((rows, cols))
    t_nbr, t_mask, _, t_slot, t_inv, _ = bucketize(
        cols[t_order], rows[t_order], edge_flat[t_order])
    return BucketedNodeELLPattern(f_nbr, f_mask, f_rows, f_inv,
                                  t_nbr, t_slot, t_mask, t_inv, n)


# Small-D unrolled forms (measured 25-40% step-level win on v5e vs the
# (R, D, F)-gather einsums, kernels/spmm_ell_node.py round-5 note): the
# einsum materialises the 3-D gather in HBM; per-slot gathers stream one
# (R, F) slice at a time. Wide rows fall back to the einsum.
from megacrn_tpu.kernels.spmm_ell_node import _UNROLL_MAX_D


def _slot_spmm(w, nbr, x):
    """y = sum_d w[:, d] * x[nbr[:, d]]; w (R, D), x (N, F) -> (R, F).
    Delegates to the canonical unrolled form (one implementation of the
    unroll policy; the w -> x.dtype cast there is a no-op on this path,
    whose callers pre-cast the learned weights)."""
    from megacrn_tpu.kernels.spmm_ell_node import _ell_apply

    return _ell_apply(nbr, w, x)


def _slot_sddmm(a, nbr, b):
    """scores[:, d] = a . b[nbr[:, d]]; a (R, K), b (N, K) -> (R, D)."""
    if nbr.shape[1] <= _UNROLL_MAX_D:
        return jnp.stack([jnp.sum(a * b[nbr[:, d]], axis=-1)
                          for d in range(nbr.shape[1])], axis=1)
    return jnp.einsum("rk,rdk->rd", a, b[nbr],
                      preferred_element_type=a.dtype)


def sddmm_node(e1: jnp.ndarray, e2: jnp.ndarray, nbr: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """scores[r, d] = e1[r] . e2[nbr[r, d]] (masked). e1/e2: (N, dim)."""
    return _slot_sddmm(e1, nbr, e2) * mask


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
    return _slot_spmm(w, nbr, x)


def _spmm_node_fwd(nbr, mask, t_nbr, t_slot, t_mask, w, x):
    y = spmm_node(nbr, mask, t_nbr, t_slot, t_mask, w, x)
    return y, (nbr, mask, t_nbr, t_slot, t_mask, w, x)


def _spmm_node_bwd(res, dy):
    nbr, mask, t_nbr, t_slot, t_mask, w, x = res
    # dx = A^T @ dy: the transposed pattern's values are the forward
    # weights gathered through the precomputed slot map — pure gathers.
    w_t = w.reshape(-1)[t_slot] * t_mask.astype(w.dtype)
    dx = _slot_spmm(w_t, t_nbr, dy)
    # dw = SDDMM(dy, x) on the pattern slots.
    dw = _slot_sddmm(dy, nbr, x) * mask.astype(dy.dtype)
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zero = lambda a: jnp.zeros_like(a)
    return (int_zero(nbr), zero(mask), int_zero(t_nbr), int_zero(t_slot),
            zero(t_mask), dw, dx)


spmm_node.defvjp(_spmm_node_fwd, _spmm_node_bwd)


def sddmm_node_bucketed(e1, e2, pattern: BucketedNodeELLPattern):
    """Per-bucket SDDMM: scores_b[i, d] = e1[rows_b[i]] . e2[nbr_b[i, d]].
    Returns a tuple of per-bucket (n_b, D_b) score arrays."""
    return tuple(
        _slot_sddmm(e1[rows], nbr, e2) * mask
        for nbr, mask, rows in zip(pattern.nbr, pattern.mask, pattern.rows))


def node_row_softmax_bucketed(scores, pattern: BucketedNodeELLPattern):
    """Masked softmax per row — rows never span buckets, so the flat
    implementation applies bucket-wise unchanged."""
    return tuple(node_row_softmax(s, m)
                 for s, m in zip(scores, pattern.mask))


@jax.custom_vjp
def spmm_node_bucketed(nbr, mask, rows, inv, t_nbr, t_slot, t_mask, t_inv,
                       w, x):
    """y[r] = sum_d w_b[i, d] * x[nbr_b[i, d]] over the bucketed layout;
    differentiable in w (tuple of per-bucket arrays) and x, scatter-free
    both ways. Returns (N, F) in ORIGINAL row order."""
    parts = [_slot_spmm(w_b, nbr_b, x) for w_b, nbr_b in zip(w, nbr)]
    return jnp.concatenate(parts, axis=0)[inv]


def _spmm_bucketed_fwd(nbr, mask, rows, inv, t_nbr, t_slot, t_mask, t_inv,
                       w, x):
    y = spmm_node_bucketed(nbr, mask, rows, inv, t_nbr, t_slot, t_mask,
                           t_inv, w, x)
    return y, (nbr, mask, rows, inv, t_nbr, t_slot, t_mask, t_inv, w, x)


def _spmm_bucketed_bwd(res, dy):
    nbr, mask, rows, inv, t_nbr, t_slot, t_mask, t_inv, w, x = res
    # dx = A^T @ dy: transposed-pattern weights gathered from the forward
    # concat layout through the precomputed flat slot map.
    w_flat = jnp.concatenate([w_b.reshape(-1) for w_b in w])
    dx_parts = [_slot_spmm(w_flat[ts] * tm.astype(w_flat.dtype), tn, dy)
                for tn, ts, tm in zip(t_nbr, t_slot, t_mask)]
    dx = jnp.concatenate(dx_parts, axis=0)[t_inv]
    # dw_b = SDDMM(dy[rows_b], x[nbr_b]) on the pattern slots.
    dw = tuple(_slot_sddmm(dy[rows_b], nbr_b, x) * mask_b.astype(dy.dtype)
               for rows_b, nbr_b, mask_b in zip(rows, nbr, mask))
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zero = lambda a: jnp.zeros_like(a)
    tmap = lambda f, t: tuple(f(a) for a in t)
    return (tmap(int_zero, nbr), tmap(zero, mask), tmap(int_zero, rows),
            int_zero(inv), tmap(int_zero, t_nbr), tmap(int_zero, t_slot),
            tmap(zero, t_mask), int_zero(t_inv), dw, dx)


spmm_node_bucketed.defvjp(_spmm_bucketed_fwd, _spmm_bucketed_bwd)


def sparse_meta_graph_node(memory: jnp.ndarray, we1: jnp.ndarray,
                           we2: jnp.ndarray, pattern
                           ) -> Tuple:
    """Edge-restricted learned supports at node granularity: the meta-graph
    hypernetwork (model/MegaCRN.py:168-173) evaluated on the pattern slots
    only, row-softmax over each row's edges. For a flat ``NodeELLPattern``
    returns (w1, w2) (N, D) arrays; for a ``BucketedNodeELLPattern``
    returns (w1, w2) per-bucket tuples — both usable with
    ``cheb_aggregate_learned_node``."""
    e1 = we1 @ memory
    e2 = we2 @ memory
    if isinstance(pattern, BucketedNodeELLPattern):
        relu_t = lambda t: tuple(jax.nn.relu(s) for s in t)
        s1 = relu_t(sddmm_node_bucketed(e1, e2, pattern))
        s2 = relu_t(sddmm_node_bucketed(e2, e1, pattern))
        return (node_row_softmax_bucketed(s1, pattern),
                node_row_softmax_bucketed(s2, pattern))
    s1 = jax.nn.relu(sddmm_node(e1, e2, pattern.nbr, pattern.mask))
    s2 = jax.nn.relu(sddmm_node(e2, e1, pattern.nbr, pattern.mask))
    return (node_row_softmax(s1, pattern.mask),
            node_row_softmax(s2, pattern.mask))


def cheb_aggregate_learned_node(weights, pattern,
                                x: jnp.ndarray, cheb_k: int) -> jnp.ndarray:
    """Chebyshev stack (reference order, model/MegaCRN.py:17-26) over
    learned node-ELL supports. weights: sequence of (N, D) arrays (flat
    pattern) or of per-bucket tuples (bucketed pattern);
    x: (B, N, C) -> (B, N, S*K, C)."""
    b, n, c = x.shape
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)

    if isinstance(pattern, BucketedNodeELLPattern):
        def apply(w, v):
            cast = lambda t: tuple(a.astype(v.dtype) for a in t)
            return spmm_node_bucketed(
                pattern.nbr, cast(pattern.mask), pattern.rows, pattern.inv,
                pattern.t_nbr, pattern.t_slot, cast(pattern.t_mask),
                pattern.t_inv, cast(w), v)
    else:
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
