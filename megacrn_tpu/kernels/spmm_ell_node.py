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


class BucketedStackedNodeELL(NamedTuple):
    """Degree-bucketed stacked node-ELL pack (+ transpose for the VJP).

    The flat pack pads every row to the GLOBAL max degree, so gather
    traffic carries a ``D_max / D_mean`` padding tax (measured 36-42% pure
    waste on road graphs). Here rows are sorted by degree and split into
    up to ``max_buckets`` groups, each padded only to its own max; the
    per-bucket gather+reduce outputs are concatenated and un-permuted by
    ONE static gather (``inv``: original row -> sorted position).

    fwd_nbr/fwd_w: per-bucket tuples of (n_b, D_b) arrays (sorted order);
    fwd_inv: (R,) int32 with ``y = concat(parts)[fwd_inv]``. Same trio for
    the transposed pack (in-degree distribution). Column ids are stacked
    (offset by s*n) exactly like StackedNodeELL.
    """

    fwd_nbr: tuple
    fwd_w: tuple
    fwd_inv: jnp.ndarray
    bwd_nbr: tuple
    bwd_w: tuple
    bwd_inv: jnp.ndarray
    num_supports: int
    n: int


def _bucket_splits(deg_sorted, max_buckets):
    """Optimal bucket cut points: minimise total padded slots
    ``sum_b n_b * max_deg_b`` by DP over the (few) distinct degree values.
    Returns a list of end indices (exclusive) into the sorted row order."""
    r = len(deg_sorted)
    # Candidate cut positions: after the last row of each distinct degree.
    ends = list(np.searchsorted(deg_sorted, np.unique(deg_sorted),
                                side="right"))
    # dp[(i, k)] = (min slots covering rows [0, ends[i]) with k buckets)
    import functools

    @functools.lru_cache(maxsize=None)
    def dp(i, k):
        end = ends[i]
        if k == 1:
            return int(end) * int(deg_sorted[end - 1]), (i,)
        best, best_cuts = dp(i, 1)
        for j in range(i):
            left, cuts = dp(j, k - 1)
            cost = left + (end - ends[j]) * int(deg_sorted[end - 1])
            if cost < best:
                best, best_cuts = cost, cuts + (i,)
        return best, best_cuts

    best, cuts = dp(len(ends) - 1, 1)
    for k in range(2, max_buckets + 1):
        c, cut_ids = dp(len(ends) - 1, k)
        if c < best:
            best, cuts = c, cut_ids
    return best, [ends[i] for i in cuts]


def _to_bucketed(rows, cols, vals, n_rows, max_buckets):
    """COO (stacked ids) -> per-bucket (nbr, w) + inverse permutation."""
    counts = np.bincount(rows, minlength=n_rows)
    order = np.argsort(counts, kind="stable")  # rows sorted by degree
    deg_sorted = counts[order]
    _, cut_ends = _bucket_splits(deg_sorted, max_buckets)
    rank = np.empty(n_rows, np.int64)
    rank[order] = np.arange(n_rows)
    # Slot layout within each row (rows already lexsorted by caller).
    slot = _slots_for(rows)
    nbrs, ws = [], []
    start = 0
    for end in cut_ends:
        d_b = max(1, int(deg_sorted[end - 1]))
        nbrs.append(np.zeros((end - start, d_b), np.int32))
        ws.append(np.zeros((end - start, d_b), np.float32))
        start = end
    starts = np.concatenate([[0], np.asarray(cut_ends[:-1])])
    bucket_of = np.searchsorted(np.asarray(cut_ends), rank[rows],
                                side="right")
    local_row = rank[rows] - starts[bucket_of]
    for b in range(len(cut_ends)):
        m = bucket_of == b
        nbrs[b][local_row[m], slot[m]] = cols[m]
        ws[b][local_row[m], slot[m]] = vals[m]
    inv = rank  # y_original[r] = concat(parts)[rank[r]]
    return (tuple(jnp.asarray(a) for a in nbrs),
            tuple(jnp.asarray(a) for a in ws),
            jnp.asarray(inv.astype(np.int32)))


def _slots_for(rows):
    """Per-edge slot index within its (sorted) row run."""
    if not len(rows):
        return np.zeros((0,), np.int64)
    change = np.concatenate([[True], rows[1:] != rows[:-1]])
    idx = np.arange(len(rows))
    run_start = np.maximum.accumulate(np.where(change, idx, 0))
    return idx - run_start


def _stacked_coo(supports):
    sups = [np.asarray(s, np.float32) for s in supports]
    n = sups[0].shape[0]
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
    return n, len(sups), (cat(rf), cat(cf), cat(vf)), (cat(rt), cat(ct),
                                                       cat(vt))


def _lexsorted(rows, cols, vals):
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def build_stacked_node_ell(supports, max_buckets: int = 4,
                           min_saving: float = 0.10):
    """supports: list of (N, N) numpy arrays (dual_random_walk_supports of
    the road adjacency). Builds stacked fwd + transposed packs WITHOUT ever
    materialising a block-diagonal dense matrix (O(nnz) host memory — the
    dense builder needed 78 GB at N=32768).

    When degree-bucketing (``max_buckets`` > 1) saves at least
    ``min_saving`` of the padded gather slots — it saves 36-42% on road
    graphs, whose max degree is ~2.5x the mean — returns a
    ``BucketedStackedNodeELL``; otherwise the flat ``StackedNodeELL``.
    Both run through the same aggregation/VJP entry points."""
    n, s_num, fwd_coo, bwd_coo = _stacked_coo(supports)
    r_total = s_num * n
    rf, cf, vf = _lexsorted(*fwd_coo)
    rt, ct, vt = _lexsorted(*bwd_coo)

    # Savings estimate over BOTH packs (fwd buckets by out-degree, the VJP
    # transpose by in-degree — they differ on asymmetric supports).
    flat_slots = 0
    best_slots = 0
    for r_side in (rf, rt):
        counts = np.bincount(r_side, minlength=r_total)
        flat_slots += r_total * max(1, int(counts.max()))
        s, _ = _bucket_splits(np.sort(counts), max_buckets)
        best_slots += s
    if max_buckets > 1 and best_slots <= (1.0 - min_saving) * flat_slots:
        f_nbr, f_w, f_inv = _to_bucketed(rf, cf, vf, r_total, max_buckets)
        b_nbr, b_w, b_inv = _to_bucketed(rt, ct, vt, r_total, max_buckets)
        return BucketedStackedNodeELL(f_nbr, f_w, f_inv, b_nbr, b_w, b_inv,
                                      s_num, n)
    fwd = _to_node_ell(rf, cf, vf, r_total, r_total)
    bwd = _to_node_ell(rt, ct, vt, r_total, r_total)
    return StackedNodeELL(fwd, bwd, s_num, n)


def _occupied(nbr, w) -> int:
    """Occupied-slot count of one (R, D) pack. Builders store only nonzero
    COO values, so at build time ``w != 0`` alone is exact; the ``nbr != 0``
    union keeps the count correct for packs whose weights were later cast
    (e.g. a bf16 underflow) — only pads have nbr == 0 AND w == 0 (modulo an
    underflowed edge pointing at column 0, which cannot be distinguished)."""
    return int(np.count_nonzero((np.asarray(w) != 0)
                                | (np.asarray(nbr) != 0)))


def pack_nnz(pack) -> int:
    """True stored edge count of a stacked node-ELL pack (both variants)."""
    if isinstance(pack, BucketedStackedNodeELL):
        return sum(_occupied(nbr, w)
                   for nbr, w in zip(pack.fwd_nbr, pack.fwd_w))
    return _occupied(pack.pack.nbr, pack.pack.w)


# Max neighbor-slot count to unroll: road graphs sit well under this; a
# pathological wide bucket falls back to the einsum so program size stays
# bounded.
_UNROLL_MAX_D = 32


def _ell_apply(nbr, w, x):
    """y = sum_d w[:, d] * x[nbr[:, d]] — gather + weighted reduce.

    For small D the reduction is unrolled into per-slot (R, F) gathers
    accumulated in place: measured 25% faster than the (R, D, F)-gather
    einsum at N=16384/F=256 on v5e (the einsum materialises the 3-D gather
    in HBM; the unrolled form streams one slot at a time). Wide rows fall
    back to the einsum."""
    if nbr.shape[1] <= _UNROLL_MAX_D:
        acc = None
        for d in range(nbr.shape[1]):
            t = w[:, d:d + 1].astype(x.dtype) * x[nbr[:, d]]
            acc = t if acc is None else acc + t
        return acc
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
    # Integer primals (the nbr index arrays) formally take float0 cotangents
    # — symbolic zeros of the correct tangent type, not int zeros (stricter
    # JAX dtype checking rejects the latter).
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zero = lambda a: jnp.zeros_like(a)
    return (int_zero(nbr_t), zero(w_t), int_zero(nbr_t), zero(w_t), dx)


spmm_node_ell.defvjp(_spmm_fwd, _spmm_bwd)


def _bucketed_apply(nbrs, ws, inv, x):
    """Per-bucket gather + weighted reduce, concatenated, un-permuted.
    Each bucket reduces via ``_ell_apply`` (unrolled small-D form)."""
    parts = [_ell_apply(nbr, w, x) for nbr, w in zip(nbrs, ws)]
    return jnp.concatenate(parts, axis=0)[inv]


@jax.custom_vjp
def spmm_node_ell_bucketed(fwd_nbr, fwd_w, fwd_inv, bwd_nbr, bwd_w, bwd_inv,
                           x):
    return _bucketed_apply(fwd_nbr, fwd_w, fwd_inv, x)


def _spmm_bucketed_fwd(fwd_nbr, fwd_w, fwd_inv, bwd_nbr, bwd_w, bwd_inv, x):
    y = _bucketed_apply(fwd_nbr, fwd_w, fwd_inv, x)
    return y, (fwd_nbr, fwd_w, fwd_inv, bwd_nbr, bwd_w, bwd_inv)


def _spmm_bucketed_bwd(res, dy):
    fwd_nbr, fwd_w, fwd_inv, bwd_nbr, bwd_w, bwd_inv = res
    dx = _bucketed_apply(bwd_nbr, bwd_w, bwd_inv, dy)
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zero = lambda a: jnp.zeros_like(a)
    tmap = lambda f, t: tuple(f(a) for a in t)
    return (tmap(int_zero, fwd_nbr), tmap(zero, fwd_w), int_zero(fwd_inv),
            tmap(int_zero, bwd_nbr), tmap(zero, bwd_w), int_zero(bwd_inv),
            dx)


spmm_node_ell_bucketed.defvjp(_spmm_bucketed_fwd, _spmm_bucketed_bwd)


def cheb_aggregate_node_ell(packs, x: jnp.ndarray,
                            cheb_k: int) -> jnp.ndarray:
    """Chebyshev feature stack over static sparse supports via the stacked
    node-ELL pack (flat ``StackedNodeELL`` or degree-bucketed
    ``BucketedStackedNodeELL``). Output layout identical to
    ``ops.graph.cheb_aggregate``: (B, N, S*K, C), support-major
    ``[I, A, T2(A), ...]``."""
    s_num, n = packs.num_supports, packs.n
    b, n_in, c = x.shape
    if n_in != n:
        raise ValueError(f"x has {n_in} nodes, pack expects {n}")
    flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * c)
    x_stack = jnp.tile(flat, (s_num, 1))  # (S*n, F)
    if isinstance(packs, BucketedStackedNodeELL):
        apply = lambda v: spmm_node_ell_bucketed(
            packs.fwd_nbr, packs.fwd_w, packs.fwd_inv,
            packs.bwd_nbr, packs.bwd_w, packs.bwd_inv, v)
    else:
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


# ---------------------------------------------------------------------------
# Node-partitioned (mesh) variant: each device owns the ELL rows of its node
# block; x node-blocks are all-gathered over the mesh node axis (ICI) and the
# gather-reduce runs on local rows only. Mirrors kernels.spmm.shard_road_packs
# for the tile path. Autodiff inserts the scatter-add + psum_scatter for dx
# through the gather/all_gather transposes.
# ---------------------------------------------------------------------------

class ShardedNodeELL:
    """Per-device row-partitioned node-ELL supports, stacked for shard_map.

    nbr/w: (D_dev, S, n_loc, D) — shard_map in_specs split dim 0 over the
    node axis. Column ids are GLOBAL node ids in [0, n_full). n_loc/n_full
    are static pytree aux (trace-time shapes)."""

    def __init__(self, nbr, w, n_loc: int, n_full: int):
        self.nbr, self.w = nbr, w
        self.n_loc, self.n_full = n_loc, n_full

    def tree_flatten(self):
        return ((self.nbr, self.w), (self.n_loc, self.n_full))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    ShardedNodeELL, ShardedNodeELL.tree_flatten, ShardedNodeELL.tree_unflatten)


class LocalNodeELL(NamedTuple):
    """This device's row block inside shard_map: nbr/w (S, n_loc, D)."""

    nbr: jnp.ndarray
    w: jnp.ndarray
    n_full: int


class BucketedShardedNodeELL:
    """Shape-uniform degree-bucketed node-partitioned ELL supports.

    The flat ``ShardedNodeELL`` pads every device's rows to the GLOBAL max
    degree (the same 36-42% padded-slot tax the single-chip flat pack
    carries — measured in STATUS.md's ELL table). shard_map requires
    identical array shapes on every device, so per-device bucketing is not
    allowed to give devices different bucket sizes; instead the buckets are
    cut on the ENVELOPE of the per-device sorted degree profiles
    (``env[r] = max over devices of each device's r-th smallest local
    degree``): every device sorts its local rows by degree, bucket b holds
    sorted ranks [start_b, end_b) on EVERY device, padded to the envelope's
    bucket max ``D_b`` — uniform (n_b, D_b) shapes by construction, and the
    DP cut-point search minimises exactly the real total
    ``n_shards * sum_b n_b * D_b``.

    nbr/w: tuple over supports of tuples over buckets of
    (n_shards, n_b, D_b) arrays — device dim first, split over the mesh
    node axis by shard_map in_specs; column ids are GLOBAL node ids in
    [0, n_full). inv: tuple over supports of (n_shards, n_loc) int32 with
    ``y_local = concat_b(bucket outputs)[inv]`` (each device's own
    degree-sort un-permute). n_loc/n_full are static pytree aux.
    """

    def __init__(self, nbr, w, inv, n_loc: int, n_full: int):
        self.nbr, self.w, self.inv = nbr, w, inv
        self.n_loc, self.n_full = n_loc, n_full

    def tree_flatten(self):
        return ((self.nbr, self.w, self.inv), (self.n_loc, self.n_full))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    BucketedShardedNodeELL, BucketedShardedNodeELL.tree_flatten,
    BucketedShardedNodeELL.tree_unflatten)


class LocalBucketedNodeELL(NamedTuple):
    """This device's row blocks inside shard_map: per-support tuples of
    per-bucket (n_b, D_b) nbr/w arrays + (n_loc,) un-permute."""

    nbr: tuple
    w: tuple
    inv: tuple
    n_full: int


def shard_node_ell(supports, n_shards: int, max_buckets: int = 4,
                   min_saving: float = 0.10):
    """Row-partition dense numpy supports for the node-sharded ELL path.
    supports: list of (N, N) numpy arrays; N must divide by n_shards.

    When shape-uniform degree bucketing (see ``BucketedShardedNodeELL``)
    saves at least ``min_saving`` of the padded gather slots vs the flat
    global-max-degree layout, returns the bucketed pack; otherwise (or with
    ``max_buckets=1``) the flat ``ShardedNodeELL``. Both run through
    ``make_road_node_train_step`` /
    ``cheb_aggregate_node_ell_sharded`` unchanged."""
    sups = [np.asarray(s, np.float32) for s in supports]
    n = sups[0].shape[0]
    if n % n_shards:
        raise ValueError(f"num_nodes {n} not divisible by {n_shards}")
    n_loc = n // n_shards
    # One GLOBAL max degree so every (device, support) slice is uniform.
    d_max = 1
    degs = []  # per support: (n_shards, n_loc) local row degrees
    for a in sups:
        deg = (a != 0).sum(1).reshape(n_shards, n_loc)
        degs.append(deg)
        d_max = max(d_max, int(deg.max()))
    flat_slots = len(sups) * n_shards * n_loc * d_max

    if max_buckets > 1:
        plans = []  # per support: (cut_ends, widths) on the envelope
        bucket_slots = 0
        for deg in degs:
            env = np.sort(deg, axis=1).max(axis=0)  # nondecreasing envelope
            slots, cut_ends = _bucket_splits(env, max_buckets)
            widths = [max(1, int(env[e - 1])) for e in cut_ends]
            starts = [0] + list(cut_ends[:-1])
            bucket_slots += n_shards * sum(
                (e - s) * d for s, e, d in zip(starts, cut_ends, widths))
            plans.append((cut_ends, widths))
        if bucket_slots <= (1.0 - min_saving) * flat_slots:
            return _shard_node_ell_bucketed(sups, n_shards, degs, plans)

    nbr = np.zeros((n_shards, len(sups), n_loc, d_max), np.int32)
    w = np.zeros((n_shards, len(sups), n_loc, d_max), np.float32)
    for si, a in enumerate(sups):
        for dev in range(n_shards):
            blk = a[dev * n_loc:(dev + 1) * n_loc]
            rows, cols = np.nonzero(blk)
            counts = np.bincount(rows, minlength=n_loc)
            slot = (np.concatenate([np.arange(c) for c in counts])
                    if len(rows) else np.zeros((0,), np.int64))
            nbr[dev, si][rows, slot] = cols
            w[dev, si][rows, slot] = blk[rows, cols]
    return ShardedNodeELL(jnp.asarray(nbr), jnp.asarray(w), n_loc, n)


def _shard_node_ell_bucketed(sups, n_shards, degs, plans):
    """Pack every device's degree-sorted local rows into the shared
    envelope buckets (``plans``: per-support (cut_ends, widths))."""
    n = sups[0].shape[0]
    n_loc = n // n_shards
    all_nbr, all_w, all_inv = [], [], []
    for a, deg, (cut_ends, widths) in zip(sups, degs, plans):
        starts = [0] + list(cut_ends[:-1])
        nbrs = [np.zeros((n_shards, e - s, d), np.int32)
                for s, e, d in zip(starts, cut_ends, widths)]
        ws = [np.zeros((n_shards, e - s, d), np.float32)
              for s, e, d in zip(starts, cut_ends, widths)]
        inv = np.zeros((n_shards, n_loc), np.int32)
        starts_a, ends_a = np.asarray(starts), np.asarray(cut_ends)
        for dev in range(n_shards):
            order = np.argsort(deg[dev], kind="stable")
            rank = np.empty(n_loc, np.int64)
            rank[order] = np.arange(n_loc)
            inv[dev] = rank
            blk = a[dev * n_loc:(dev + 1) * n_loc]
            rows, cols = np.nonzero(blk)  # row-major: rows nondecreasing
            vals = blk[rows, cols]
            slot = _slots_for(rows)
            r_rank = rank[rows]
            bucket_of = np.searchsorted(ends_a, r_rank, side="right")
            local_row = r_rank - starts_a[bucket_of]
            for b in range(len(cut_ends)):
                m = bucket_of == b
                nbrs[b][dev][local_row[m], slot[m]] = cols[m]
                ws[b][dev][local_row[m], slot[m]] = vals[m]
        all_nbr.append(tuple(jnp.asarray(x) for x in nbrs))
        all_w.append(tuple(jnp.asarray(x) for x in ws))
        all_inv.append(jnp.asarray(inv))
    return BucketedShardedNodeELL(tuple(all_nbr), tuple(all_w),
                                  tuple(all_inv), n_loc, n)


def local_node_ell(sp):
    """Inside shard_map (arrays carry a length-1 device dim)."""
    if isinstance(sp, BucketedShardedNodeELL):
        strip = lambda t: tuple(a[0] for a in t)
        return LocalBucketedNodeELL(tuple(strip(t) for t in sp.nbr),
                                    tuple(strip(t) for t in sp.w),
                                    tuple(a[0] for a in sp.inv), sp.n_full)
    return LocalNodeELL(sp.nbr[0], sp.w[0], sp.n_full)


def cheb_aggregate_node_ell_sharded(pack, x: jnp.ndarray,
                                    cheb_k: int, axis_name: str
                                    ) -> jnp.ndarray:
    """Node-partitioned Chebyshev stack (inside shard_map): all-gather the x
    node-blocks over ``axis_name``, gather-reduce on local rows. Output
    (B, n_loc, S*K, C) node-local. Intermediate terms are re-gathered per
    extra Chebyshev level, as in parallel.ring.cheb_aggregate_sparse_sharded.
    ``pack``: LocalNodeELL (flat) or LocalBucketedNodeELL (per-bucket
    gather-reduce, concatenated along local rows, one static un-permute)."""

    def gather(t):  # (B, n_loc, C) -> (B, N, C)
        return jax.lax.all_gather(t, axis_name, axis=1, tiled=True)

    def apply_batched(nbr, w, t_full):
        """y[b, r] = sum_d w[r, d] * t_full[b, nbr[r, d]] — the batch-first
        form of ``_ell_apply`` (same unrolled small-D speed path)."""
        if nbr.shape[1] <= _UNROLL_MAX_D:
            acc = None
            for d in range(nbr.shape[1]):
                t = w[:, d, None].astype(t_full.dtype) * t_full[:, nbr[:, d]]
                acc = t if acc is None else acc + t
            return acc
        return jnp.einsum("rd,brdc->brc", w.astype(t_full.dtype),
                          t_full[:, nbr],
                          preferred_element_type=t_full.dtype)

    if isinstance(pack, LocalBucketedNodeELL):
        num_supports = len(pack.nbr)

        def apply_local(s, t_full):  # t_full (B, N, C) -> (B, n_loc, C)
            parts = [apply_batched(nbr_b, w_b, t_full)
                     for nbr_b, w_b in zip(pack.nbr[s], pack.w[s])]
            return jnp.concatenate(parts, axis=1)[:, pack.inv[s]]

    else:
        num_supports = pack.nbr.shape[0]

        def apply_local(s, t_full):  # t_full (B, N, C) -> (B, n_loc, C)
            return apply_batched(pack.nbr[s], pack.w[s], t_full)

    x_full = gather(x)
    terms = []
    for s in range(num_supports):
        t_prev_l = x
        t_cur_l = apply_local(s, x_full)
        terms.append(t_prev_l)
        terms.append(t_cur_l)
        for _ in range(2, cheb_k):
            t_prev_l, t_cur_l = t_cur_l, (
                2.0 * apply_local(s, gather(t_cur_l)) - t_prev_l)
            terms.append(t_cur_l)
    return jnp.stack(terms, axis=2)
