"""Block-COO SpMM kernel + stacked block-diagonal Chebyshev aggregation
(the padding-free production road-graph path; kernels/spmm_coo.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from megacrn_tpu.kernels.spmm_coo import (build_stacked_road_pack, spmm_coo,
                                          to_block_coo, transpose_block_coo)


def _sparse(rs, r, c, density=0.04):
    return ((rs.rand(r, c) < density) * rs.randn(r, c)).astype(np.float32)


def test_spmm_coo_matches_dense_with_empty_row_block():
    rs = np.random.RandomState(0)
    a = _sparse(rs, 300, 300)
    a[128:256] = 0.0  # empty middle row-block must still produce zeros
    x = rs.randn(300, 19).astype(np.float32)
    pack, pack_t = to_block_coo(a), transpose_block_coo(a)
    y = np.asarray(spmm_coo(pack, pack_t, jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, atol=1e-4, rtol=1e-4)


def test_spmm_coo_gradient_is_transpose():
    rs = np.random.RandomState(1)
    a = _sparse(rs, 200, 200)
    x = rs.randn(200, 9).astype(np.float32)
    pack, pack_t = to_block_coo(a), transpose_block_coo(a)
    g = jax.grad(lambda v: spmm_coo(pack, pack_t, v).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g),
                               a.T @ np.ones((200, 9), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_spmm_coo_rectangular():
    rs = np.random.RandomState(2)
    a = _sparse(rs, 96, 384)
    x = rs.randn(384, 7).astype(np.float32)
    pack, pack_t = to_block_coo(a), transpose_block_coo(a)
    np.testing.assert_allclose(np.asarray(spmm_coo(pack, pack_t,
                                                   jnp.asarray(x))),
                               a @ x, atol=1e-4, rtol=1e-4)


def test_stacked_pack_has_no_cross_support_tiles():
    rs = np.random.RandomState(3)
    s1, s2 = _sparse(rs, 200, 200), _sparse(rs, 200, 200)
    sp = build_stacked_road_pack([s1, s2])
    rows, cols = np.asarray(sp.pack.rows), np.asarray(sp.pack.cols)
    blocks_per = sp.n_pad // 128
    # Block-diagonal: row and col tiles always in the same support slot.
    np.testing.assert_array_equal(rows // blocks_per, cols // blocks_per)


def test_cheb_aggregate_sparse_stacked_matches_per_support():
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.ops.graph import (cheb_aggregate_sparse,
                                       cheb_aggregate_sparse_stacked,
                                       dual_random_walk_supports)

    n = 300
    adj = synthetic_road_adjacency(n, avg_degree=5, seed=4)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]
    stacked = build_stacked_road_pack([s1, s2])
    rs = np.random.RandomState(5)
    x = rs.randn(4, n, 6).astype(np.float32)
    want = cheb_aggregate_sparse(packs, jnp.asarray(x), 3)
    got = cheb_aggregate_sparse_stacked(stacked, jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_model_forward_stacked_equals_blockell():
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.ops.graph import dual_random_walk_supports

    n = 16
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=6)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]
    stacked = build_stacked_road_pack([s1, s2])
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(7)
    x = rs.randn(4, 3, n, 1).astype(np.float32)
    yc = rs.randn(4, 3, n, 1).astype(np.float32)
    a = megacrn.forward(params, x, yc, cfg, road_supports=packs).output
    b = megacrn.forward(params, x, yc, cfg, road_supports=stacked).output
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_spmm_coo_xla_impl_matches_pallas():
    from megacrn_tpu.kernels.spmm_coo import spmm_coo_xla

    rs = np.random.RandomState(8)
    a = _sparse(rs, 300, 300)
    x = rs.randn(300, 11).astype(np.float32)
    pack, pack_t = to_block_coo(a), transpose_block_coo(a)
    y_p = np.asarray(spmm_coo(pack, pack_t, jnp.asarray(x)))
    y_x = np.asarray(spmm_coo_xla(pack, jnp.asarray(x)))
    np.testing.assert_allclose(y_x, y_p, atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda v: spmm_coo_xla(pack, v).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g),
                               a.T @ np.ones((300, 11), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_model_forward_xla_impl_equals_pallas_impl():
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.ops.graph import dual_random_walk_supports

    n = 16
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=9)
    s1, s2 = dual_random_walk_supports(adj)
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(10)
    x = rs.randn(4, 3, n, 1).astype(np.float32)
    yc = rs.randn(4, 3, n, 1).astype(np.float32)
    a = megacrn.forward(params, x, yc, cfg, road_supports=(
        build_stacked_road_pack([s1, s2], impl="pallas"))).output
    b = megacrn.forward(params, x, yc, cfg, road_supports=(
        build_stacked_road_pack([s1, s2], impl="xla"))).output
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
