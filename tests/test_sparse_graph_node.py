"""Node-granular learned sparse graph ops (kernels/sparse_graph_node.py):
SDDMM, masked row softmax, scatter-free differentiable SpMM, gradient
correctness vs the dense formulation, and the sparse_meta model backend at
node granularity (incl. equality with the tile impl and the dense model)."""
import jax
import jax.numpy as jnp
import numpy as np

from megacrn_tpu.kernels.sparse_graph_node import (build_node_pattern,
                                                   cheb_aggregate_learned_node,
                                                   node_row_softmax,
                                                   sddmm_node,
                                                   sparse_meta_graph_node,
                                                   spmm_node)


def _dense_from_weights(w, pattern):
    n = pattern.n_orig
    out = np.zeros((n, n), np.float32)
    nbr = np.asarray(pattern.nbr)
    mask = np.asarray(pattern.mask)
    for r in range(n):
        for d in range(nbr.shape[1]):
            if mask[r, d]:
                out[r, nbr[r, d]] += float(w[r, d])
    return out


def _spmm(pattern, w, x):
    return spmm_node(pattern.nbr, pattern.mask, pattern.t_nbr,
                     pattern.t_slot, pattern.t_mask, w, x)


def test_sddmm_node_matches_dense_masked():
    n, dim = 60, 7
    rng = np.random.RandomState(0)
    adj = (rng.rand(n, n) < 0.08).astype(np.float32)
    pattern = build_node_pattern(adj, max_buckets=1)
    e1 = rng.randn(n, dim).astype(np.float32)
    e2 = rng.randn(n, dim).astype(np.float32)
    scores = sddmm_node(jnp.asarray(e1), jnp.asarray(e2), pattern.nbr,
                        pattern.mask)
    np.testing.assert_allclose(_dense_from_weights(np.asarray(scores),
                                                   pattern),
                               (e1 @ e2.T) * adj, atol=1e-4, rtol=1e-4)


def test_node_row_softmax_rows_sum_to_one():
    n = 40
    rng = np.random.RandomState(2)
    adj = (rng.rand(n, n) < 0.15).astype(np.float32)
    adj[0] = 0  # empty row
    pattern = build_node_pattern(adj, max_buckets=1)
    scores = jnp.asarray(rng.randn(*pattern.mask.shape).astype(np.float32))
    sm = node_row_softmax(scores, pattern.mask)
    dense = _dense_from_weights(np.asarray(sm), pattern)
    sums = dense.sum(1)
    has_edges = adj.sum(1) > 0
    np.testing.assert_allclose(sums[has_edges], 1.0, atol=1e-5)
    np.testing.assert_allclose(sums[~has_edges], 0.0, atol=1e-6)
    assert np.all(dense[adj == 0] == 0)


def test_spmm_node_matches_dense_and_vjp_is_exact():
    """Forward equals dense A @ x; the custom scatter-free VJP (transposed
    slot map for dx, SDDMM-shaped dw) equals the autodiff of the dense
    formulation."""
    n, f = 50, 6
    rng = np.random.RandomState(1)
    adj = (rng.rand(n, n) < 0.1).astype(np.float32)
    pattern = build_node_pattern(adj, max_buckets=1)
    w = jnp.asarray((rng.rand(*np.asarray(pattern.mask).shape) *
                     np.asarray(pattern.mask)).astype(np.float32))
    x = jnp.asarray(rng.randn(n, f).astype(np.float32))
    dy = jnp.asarray(rng.randn(n, f).astype(np.float32))

    a_dense = _dense_from_weights(np.asarray(w), pattern)
    y = _spmm(pattern, w, x)
    np.testing.assert_allclose(np.asarray(y), a_dense @ np.asarray(x),
                               atol=1e-4, rtol=1e-4)

    # VJP vs the dense reference vjp.
    _, vjp = jax.vjp(lambda w_, x_: _spmm(pattern, w_, x_), w, x)
    dw, dx = vjp(dy)
    np.testing.assert_allclose(np.asarray(dx),
                               a_dense.T @ np.asarray(dy), atol=1e-4,
                               rtol=1e-4)
    # dw[r, d] = dy[r] . x[nbr[r, d]] on real slots, 0 on pads.
    nbr = np.asarray(pattern.nbr)
    mask = np.asarray(pattern.mask)
    expect = np.einsum("rf,rdf->rd", np.asarray(dy),
                       np.asarray(x)[nbr]) * mask
    np.testing.assert_allclose(np.asarray(dw), expect, atol=1e-4, rtol=1e-4)


def test_sparse_meta_node_grads_reach_memory():
    n = 70
    rng = np.random.RandomState(3)
    adj = (rng.rand(n, n) < 0.07).astype(np.float32)
    np.fill_diagonal(adj, 1)
    pattern = build_node_pattern(adj, max_buckets=1)
    mem = jnp.asarray(rng.randn(5, 6), jnp.float32)
    we1 = jnp.asarray(rng.randn(n, 5), jnp.float32)
    we2 = jnp.asarray(rng.randn(n, 5), jnp.float32)
    x = jnp.asarray(rng.randn(n, 4), jnp.float32)

    def loss(mem):
        w1, w2 = sparse_meta_graph_node(mem, we1, we2, pattern)
        return jnp.sum(_spmm(pattern, w1, x) ** 2 +
                       _spmm(pattern, w2, x) ** 2)

    g = jax.grad(loss)(mem)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).sum()) > 0


def test_sparse_meta_node_full_pattern_equals_dense_forward():
    """With a complete edge pattern the node-granular sparse_meta backend
    reproduces the dense model exactly (same bar as the tile impl)."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.models import megacrn

    n = 14
    cfg_sparse = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                               horizon=3, seq_len=3,
                               graph_backend="sparse_meta")
    cfg_dense = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg_dense)
    pattern = build_node_pattern(np.ones((n, n), np.float32))
    x = np.random.RandomState(0).randn(2, 3, n, 1).astype(np.float32)
    ycov = np.random.RandomState(1).randn(2, 3, n, 1).astype(np.float32)
    out_s = megacrn.forward(params, x, ycov, cfg_sparse,
                            road_supports=pattern)
    out_d = megacrn.forward(params, x, ycov, cfg_dense)
    np.testing.assert_allclose(np.asarray(out_s.output),
                               np.asarray(out_d.output), atol=2e-4, rtol=1e-4)


def test_sparse_meta_node_equals_block_impl():
    """Node-granular and tile-granular sparse_meta are the same math on the
    same restricted pattern: identical model outputs."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.kernels.sparse_graph import build_block_pattern
    from megacrn_tpu.models import megacrn

    n = 20
    rng = np.random.RandomState(5)
    adj = (rng.rand(n, n) < 0.2).astype(np.float32)
    adj = ((adj != 0) | (adj.T != 0)).astype(np.float32)
    np.fill_diagonal(adj, 1)
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="sparse_meta")
    params = megacrn.init_params(jax.random.PRNGKey(1), cfg)
    x = rng.randn(2, 3, n, 1).astype(np.float32)
    ycov = rng.randn(2, 3, n, 1).astype(np.float32)
    out_n = megacrn.forward(params, x, ycov, cfg,
                            road_supports=build_node_pattern(adj))
    out_b = megacrn.forward(params, x, ycov, cfg,
                            road_supports=build_block_pattern(adj))
    np.testing.assert_allclose(np.asarray(out_n.output),
                               np.asarray(out_b.output), atol=2e-4,
                               rtol=1e-4)


def test_cheb_aggregate_learned_node_matches_dense_polynomials():
    """Reference concat order [I*x, A*x, T2(A)*x, ...] per support
    (model/MegaCRN.py:17-26) over the learned node-ELL supports."""
    n, b, c, k = 30, 2, 3, 3
    rng = np.random.RandomState(7)
    adj = (rng.rand(n, n) < 0.2).astype(np.float32)
    np.fill_diagonal(adj, 1)
    pattern = build_node_pattern(adj, max_buckets=1)
    w1 = jnp.asarray((rng.rand(*np.asarray(pattern.mask).shape)
                      * np.asarray(pattern.mask)).astype(np.float32))
    w2 = jnp.asarray((rng.rand(*np.asarray(pattern.mask).shape)
                      * np.asarray(pattern.mask)).astype(np.float32))
    x = rng.randn(b, n, c).astype(np.float32)
    out = cheb_aggregate_learned_node((w1, w2), pattern, jnp.asarray(x), k)
    assert out.shape == (b, n, 2 * k, c)
    for si, w in enumerate((w1, w2)):
        a = _dense_from_weights(np.asarray(w), pattern)
        t = [np.eye(n, dtype=np.float32), a, 2 * a @ a - np.eye(n)]
        for ki in range(k):
            expect = np.einsum("nm,bmc->bnc", t[ki], x)
            np.testing.assert_allclose(np.asarray(out[:, :, si * k + ki]),
                                       expect, atol=1e-3, rtol=1e-3)


def test_sparse_meta_bucketed_pattern_equals_flat():
    """Degree-bucketed learned pattern == flat pattern through the FULL
    model (forward AND parameter gradients): bucketing only relayouts the
    gathers; SDDMM/softmax/SpMM math is unchanged."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.kernels.sparse_graph_node import (
        BucketedNodeELLPattern, NodeELLPattern, build_node_pattern)
    from megacrn_tpu.models import megacrn

    n = 30
    rng = np.random.RandomState(11)
    adj = (rng.rand(n, n) < 0.12).astype(np.float32)
    adj = ((adj != 0) | (adj.T != 0)).astype(np.float32)
    np.fill_diagonal(adj, 1)
    flat = build_node_pattern(adj, max_buckets=1)
    bucketed = build_node_pattern(adj, max_buckets=4, min_saving=0.0)
    assert isinstance(flat, NodeELLPattern)
    assert isinstance(bucketed, BucketedNodeELLPattern)

    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="sparse_meta")
    params = megacrn.init_params(jax.random.PRNGKey(2), cfg)
    x = rng.randn(2, 3, n, 1).astype(np.float32)
    ycov = rng.randn(2, 3, n, 1).astype(np.float32)
    out_f = megacrn.forward(params, x, ycov, cfg, road_supports=flat)
    out_b = megacrn.forward(params, x, ycov, cfg, road_supports=bucketed)
    np.testing.assert_allclose(np.asarray(out_b.output),
                               np.asarray(out_f.output), atol=2e-5,
                               rtol=2e-5)

    def loss(params, pat):
        out = megacrn.forward(params, x, ycov, cfg, road_supports=pat)
        return jnp.mean(out.output ** 2) + jnp.mean(out.query ** 2)

    g_f = jax.grad(loss)(params, flat)
    g_b = jax.grad(loss)(params, bucketed)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)
