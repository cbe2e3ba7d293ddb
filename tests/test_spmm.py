"""Pallas block-sparse SpMM: correctness vs dense matmul (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.data.synthetic import synthetic_road_adjacency
from megacrn_tpu.kernels.spmm import (BLOCK, spmm, spmm_batched,
                                      to_block_ell, transpose_block_ell)


def _sparse_mat(n, seed=0, density=0.03):
    rng = np.random.RandomState(seed)
    a = (rng.rand(n, n) < density).astype(np.float32) * rng.randn(n, n)
    return a.astype(np.float32)


def test_block_ell_roundtrip_structure():
    a = _sparse_mat(200)
    pack = to_block_ell(a)
    assert pack.n == 256 and pack.n_orig == 200
    assert pack.data.shape[2:] == (BLOCK, BLOCK)
    # Reassemble dense from the pack and compare.
    dense = np.zeros((pack.n, pack.n), np.float32)
    for i in range(pack.n // BLOCK):
        for r in range(int(pack.nnz_blocks[i])):
            c = int(pack.cols[i, r])
            dense[i * BLOCK:(i + 1) * BLOCK, c * BLOCK:(c + 1) * BLOCK] += \
                np.asarray(pack.data[i, r])
    np.testing.assert_allclose(dense[:200, :200], a, atol=1e-6)


def test_spmm_matches_dense():
    n, f = 200, 96
    a = _sparse_mat(n, seed=1)
    x = np.random.RandomState(2).randn(n, f).astype(np.float32)
    pack = to_block_ell(a)
    pack_t = transpose_block_ell(a)
    y = spmm(pack, pack_t, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(y), a @ x, atol=1e-4, rtol=1e-4)


def test_spmm_gradient_is_transpose_spmm():
    n, f = 140, 64
    a = _sparse_mat(n, seed=3)
    x = np.random.RandomState(4).randn(n, f).astype(np.float32)
    pack, pack_t = to_block_ell(a), transpose_block_ell(a)

    def loss(x):
        return jnp.sum(spmm(pack, pack_t, x, True) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    want = 2 * a.T @ (a @ x)
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-3, rtol=1e-4)


def test_spmm_batched_matches_einsum():
    n, b, c = 150, 4, 16
    a = np.asarray(synthetic_road_adjacency(n, avg_degree=4), np.float32)
    x = np.random.RandomState(5).randn(b, n, c).astype(np.float32)
    pack, pack_t = to_block_ell(a), transpose_block_ell(a)
    y = spmm_batched(pack, pack_t, jnp.asarray(x), True)
    want = np.einsum("nm,bmc->bnc", a, x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4, rtol=1e-4)


def test_megacrn_road_sparse_backend():
    """Full model forward with the sparse road backend vs dense equivalent."""
    import jax
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.ops.graph import dual_random_walk_supports

    n = 20
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=7)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]

    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(0).randn(2, 3, n, 1).astype(np.float32)
    ycov = np.random.RandomState(1).randn(2, 3, n, 1).astype(np.float32)
    out = megacrn.forward(params, x, ycov, cfg, road_supports=packs)

    # Dense-math equivalent: same params, dense supports replacing the
    # meta-graph via monkeypatched aggregation.
    cfg_dense = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3)
    from megacrn_tpu.ops import graph as graph_ops

    dense_supports = jnp.stack([jnp.asarray(s1), jnp.asarray(s2)])
    orig = graph_ops.meta_graph
    try:
        graph_ops.meta_graph = lambda *a: dense_supports
        import megacrn_tpu.models.megacrn as mm
        mm.meta_graph = graph_ops.meta_graph
        want = megacrn.forward(params, x, ycov, cfg_dense)
    finally:
        graph_ops.meta_graph = orig
        mm.meta_graph = orig
    np.testing.assert_allclose(np.asarray(out.output),
                               np.asarray(want.output), atol=1e-4, rtol=1e-4)


def test_rcm_reduces_block_count():
    from megacrn_tpu.kernels.spmm import rcm_ordering

    n = 400
    # locality graph scrambled by a random permutation
    rng = np.random.RandomState(0)
    base = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for d in (1, 2, 3):
        base[idx, (idx + d) % n] = 1
        base[(idx + d) % n, idx] = 1
    scram = rng.permutation(n)
    a = base[scram][:, scram]

    perm = rcm_ordering(a)
    a_rcm = a[perm][:, perm]
    blocks_before = to_block_ell(a).cols.shape[1]
    blocks_after = to_block_ell(a_rcm).cols.shape[1]
    assert blocks_after < blocks_before
    # Same matrix up to permutation: SpMM result maps back exactly.
    x = rng.randn(n, 8).astype(np.float32)
    y = spmm(to_block_ell(a_rcm), transpose_block_ell(a_rcm),
             jnp.asarray(x[perm]), True)
    np.testing.assert_allclose(np.asarray(y), (a @ x)[perm], atol=1e-4)


def test_spmm_rectangular_pack():
    """Rectangular BlockELL (row-slice of a support): forward, gradient,
    and batched — the building block of the node-partitioned road path."""
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    a = ((rs.rand(96, 384) < 0.05) * rs.randn(96, 384)).astype(np.float32)
    x = rs.randn(384, 17).astype(np.float32)
    pack = to_block_ell(a)
    pack_t = to_block_ell(np.ascontiguousarray(a.T))
    y = np.asarray(spmm(pack, pack_t, jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, atol=1e-4, rtol=1e-4)
    g = jax.grad(lambda v: spmm(pack, pack_t, v).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g),
                               a.T @ np.ones((96, 17), np.float32),
                               atol=1e-4, rtol=1e-4)
    xb = rs.randn(3, 384, 5).astype(np.float32)
    yb = np.asarray(spmm_batched(pack, pack_t, jnp.asarray(xb)))
    np.testing.assert_allclose(yb, np.einsum("nm,bmc->bnc", a, xb),
                               atol=1e-4, rtol=1e-4)


def test_shard_road_packs_roundtrip():
    """shard_road_packs + local_packs reproduce each device's row block."""
    import jax.numpy as jnp

    from megacrn_tpu.kernels.spmm import (ShardedRoadPacks, local_packs,
                                          shard_road_packs)

    rs = np.random.RandomState(3)
    n, d = 16, 4
    s1 = ((rs.rand(n, n) < 0.3) * rs.randn(n, n)).astype(np.float32)
    s2 = ((rs.rand(n, n) < 0.3) * rs.randn(n, n)).astype(np.float32)
    sp = shard_road_packs([s1, s2], d)
    assert isinstance(sp, ShardedRoadPacks)
    assert sp.fwd_data.shape[:2] == (2, d) and sp.n_loc == n // d
    x = rs.randn(n, 5).astype(np.float32)
    for dev in range(d):
        view = ShardedRoadPacks(
            sp.fwd_data[:, dev:dev + 1], sp.fwd_cols[:, dev:dev + 1],
            sp.fwd_nnz[:, dev:dev + 1], sp.bwd_data[:, dev:dev + 1],
            sp.bwd_cols[:, dev:dev + 1], sp.bwd_nnz[:, dev:dev + 1],
            sp.n_loc, sp.n_full)
        for s, dense in enumerate([s1, s2]):
            pack, pack_t = local_packs(view)[s]
            got = np.asarray(spmm(pack, pack_t, jnp.asarray(x)))
            rows = dense[dev * sp.n_loc:(dev + 1) * sp.n_loc]
            np.testing.assert_allclose(got, rows @ x, atol=1e-4, rtol=1e-4)
