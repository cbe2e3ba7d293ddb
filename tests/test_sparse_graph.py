"""Learned block-sparse graph ops: SDDMM, masked softmax, differentiable
SpMM, and the sparse_meta model backend."""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.kernels.sparse_graph import (block_row_softmax,
                                              build_block_pattern,
                                              sddmm_blocks,
                                              sparse_meta_graph, spmm_blocks)


def _dense_from_tiles(tiles, pattern):
    nblk = tiles.shape[0]
    n = pattern.n
    out = np.zeros((n, n), np.float32)
    cols = np.asarray(pattern.cols)
    for i in range(nblk):
        for r in range(tiles.shape[1]):
            j = cols[i, r]
            out[i*128:(i+1)*128, j*128:(j+1)*128] += np.asarray(tiles[i, r])
    return out[:pattern.n_orig, :pattern.n_orig]


def test_sddmm_matches_dense_masked():
    n, d = 200, 8
    rng = np.random.RandomState(0)
    adj = (rng.rand(n, n) < 0.05).astype(np.float32)
    pattern = build_block_pattern(adj)
    e1 = rng.randn(n, d).astype(np.float32)
    e2 = rng.randn(n, d).astype(np.float32)
    tiles = sddmm_blocks(jnp.asarray(e1), jnp.asarray(e2), pattern)
    dense = _dense_from_tiles(tiles, pattern)
    np.testing.assert_allclose(dense, (e1 @ e2.T) * adj, atol=1e-4, rtol=1e-4)


def test_spmm_blocks_matches_dense_and_grads():
    n, f = 150, 32
    rng = np.random.RandomState(1)
    adj = (rng.rand(n, n) < 0.04).astype(np.float32)
    pattern = build_block_pattern(adj)
    e = rng.randn(n, 6).astype(np.float32)
    tiles = sddmm_blocks(jnp.asarray(e), jnp.asarray(e), pattern)
    x = rng.randn(n, f).astype(np.float32)
    y = spmm_blocks(tiles, pattern, jnp.asarray(x))
    a_dense = _dense_from_tiles(tiles, pattern)
    np.testing.assert_allclose(np.asarray(y), a_dense @ x, atol=1e-3,
                               rtol=1e-4)

    # Gradients flow into the embeddings THROUGH tiles (SDDMM vjp).
    def loss(e):
        t = sddmm_blocks(e, e, pattern)
        return jnp.sum(spmm_blocks(t, pattern, jnp.asarray(x)) ** 2)

    g = jax.grad(loss)(jnp.asarray(e))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_block_row_softmax_rows_sum_to_one():
    n = 140
    rng = np.random.RandomState(2)
    adj = (rng.rand(n, n) < 0.1).astype(np.float32)
    adj[0] = 0  # an empty row
    pattern = build_block_pattern(adj)
    tiles = jnp.asarray(rng.randn(*pattern.mask.shape).astype(np.float32))
    sm = block_row_softmax(tiles, pattern)
    dense = _dense_from_tiles(sm, pattern)
    sums = dense.sum(1)
    has_edges = adj[:n].sum(1) > 0
    np.testing.assert_allclose(sums[has_edges], 1.0, atol=1e-5)
    np.testing.assert_allclose(sums[~has_edges], 0.0, atol=1e-6)
    assert np.all(dense[adj == 0] == 0)


def test_sparse_meta_with_full_pattern_equals_dense_forward():
    """With a complete edge pattern the masked softmax equals the reference
    dense meta-graph, so the sparse_meta backend must reproduce the dense
    model exactly."""
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.models import megacrn

    n = 14
    cfg_sparse = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                               horizon=3, seq_len=3,
                               graph_backend="sparse_meta")
    cfg_dense = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg_dense)
    pattern = build_block_pattern(np.ones((n, n), np.float32))
    x = np.random.RandomState(0).randn(2, 3, n, 1).astype(np.float32)
    ycov = np.random.RandomState(1).randn(2, 3, n, 1).astype(np.float32)
    out_s = megacrn.forward(params, x, ycov, cfg_sparse,
                            road_supports=pattern)
    out_d = megacrn.forward(params, x, ycov, cfg_dense)
    np.testing.assert_allclose(np.asarray(out_s.output),
                               np.asarray(out_d.output), atol=2e-4, rtol=1e-4)


def test_sparse_meta_graph_grads_reach_memory():
    n = 130
    rng = np.random.RandomState(3)
    adj = (rng.rand(n, n) < 0.05).astype(np.float32)
    np.fill_diagonal(adj, 1)
    pattern = build_block_pattern(adj)
    mem = jnp.asarray(rng.randn(5, 6), jnp.float32)
    we1 = jnp.asarray(rng.randn(n, 5), jnp.float32)
    we2 = jnp.asarray(rng.randn(n, 5), jnp.float32)
    x = jnp.asarray(rng.randn(n, 4), jnp.float32)

    def loss(mem):
        t1, t2 = sparse_meta_graph(mem, we1, we2, pattern)
        return jnp.sum(spmm_blocks(t1, pattern, x) ** 2 +
                       spmm_blocks(t2, pattern, x) ** 2)

    g = jax.grad(loss)(mem)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).sum()) > 0
