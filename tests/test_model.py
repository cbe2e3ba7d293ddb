"""Model-level behavior: shapes, jit-ability, gradients, curriculum."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.config import MegaCRNConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.ops import losses

CFG = MegaCRNConfig(num_nodes=10, rnn_units=8, mem_num=4, mem_dim=8,
                    horizon=4, seq_len=4)


def _data(batch=3):
    k = jax.random.PRNGKey(0)
    kx, ky, kl = jax.random.split(k, 3)
    x = jax.random.normal(kx, (batch, CFG.seq_len, CFG.num_nodes, CFG.input_dim))
    y_cov = jax.random.normal(ky, (batch, CFG.horizon, CFG.num_nodes, CFG.ycov_dim))
    labels = jax.random.normal(kl, (batch, CFG.horizon, CFG.num_nodes, CFG.output_dim))
    return x, y_cov, labels


def test_output_shapes():
    params = megacrn.init_params(jax.random.PRNGKey(1), CFG)
    x, y_cov, _ = _data()
    out = megacrn.forward(params, x, y_cov, CFG)
    assert out.output.shape == (3, CFG.horizon, CFG.num_nodes, CFG.output_dim)
    for t in [out.h_att, out.query, out.pos, out.neg]:
        assert t.shape == (3, CFG.num_nodes, CFG.mem_dim)


def test_param_count_matches_reference_formula():
    # METR-LA default config: reference torchsummary total.
    cfg = MegaCRNConfig()
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    n = megacrn.param_count(params)

    def agcn(cin, cout, k=3):
        return 2 * k * cin * cout + cout

    h, d = cfg.rnn_units, cfg.mem_dim
    dd = cfg.decoder_dim
    want = (
        cfg.mem_num * d + h * d + 2 * cfg.num_nodes * cfg.mem_num  # memory
        + agcn(1 + h, 2 * h) + agcn(1 + h, h)  # encoder cell
        + agcn(2 + dd, 2 * dd) + agcn(2 + dd, dd)  # decoder cell
        + dd * 1 + 1  # proj
    )
    assert n == want


def test_grads_finite_through_training_forward():
    params = megacrn.init_params(jax.random.PRNGKey(2), CFG)
    x, y_cov, labels = _data()

    def loss_fn(p):
        out = megacrn.forward(p, x, y_cov, CFG, labels=labels,
                              batches_seen=5.0, rng=jax.random.PRNGKey(9),
                              training=True)
        return (losses.masked_mae_loss(out.output, labels)
                + losses.megacrn_aux_losses(out.query, out.pos, out.neg,
                                            0.01, 0.01))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    # pos/neg are stop-gradiented, but Memory still receives gradient through
    # query/value paths.
    assert float(jnp.abs(grads["memory"]["Memory"]).sum()) > 0


def test_curriculum_threshold_schedule():
    thr0 = float(megacrn.compute_sampling_threshold(2000, jnp.asarray(0.0)))
    np.testing.assert_allclose(thr0, 2000 / 2001, rtol=1e-6)
    thr_late = float(megacrn.compute_sampling_threshold(2000, jnp.asarray(40000.0)))
    assert thr_late < 1e-3


def test_curriculum_feeds_ground_truth_early():
    # At batches_seen=0 the threshold is ~1 -> nearly every decoder step is
    # teacher-forced; outputs must differ from the non-curriculum forward.
    params = megacrn.init_params(jax.random.PRNGKey(3), CFG)
    x, y_cov, labels = _data()
    fwd = functools.partial(megacrn.forward, params, x, y_cov, CFG)
    out_free = fwd()
    out_tf = fwd(labels=labels, batches_seen=0.0,
                 rng=jax.random.PRNGKey(0), training=True)
    assert not np.allclose(np.asarray(out_free.output), np.asarray(out_tf.output))


def test_eval_forward_is_deterministic():
    params = megacrn.init_params(jax.random.PRNGKey(4), CFG)
    x, y_cov, _ = _data()
    a = megacrn.forward(params, x, y_cov, CFG)
    b = megacrn.forward(params, x, y_cov, CFG)
    np.testing.assert_array_equal(np.asarray(a.output), np.asarray(b.output))


def test_bfloat16_compute_mode_runs_and_is_close():
    cfg16 = MegaCRNConfig(num_nodes=10, rnn_units=8, mem_num=4, mem_dim=8,
                          horizon=4, seq_len=4, compute_dtype="bfloat16")
    params = megacrn.init_params(jax.random.PRNGKey(5), CFG)
    x, y_cov, _ = _data()
    out32 = megacrn.forward(params, x, y_cov, CFG)
    out16 = megacrn.forward(params, x, y_cov, cfg16)
    assert out16.output.dtype == jnp.float32  # outputs upcast
    np.testing.assert_allclose(np.asarray(out16.output),
                               np.asarray(out32.output), atol=0.15)


def test_curriculum_teacher_forcing_rate_matches_threshold():
    """Distributional parity (SURVEY 7.4): the per-step Bernoulli rate of
    teacher forcing must track the inverse-sigmoid threshold."""
    thr = float(megacrn.compute_sampling_threshold(2000, jnp.asarray(1500.0)))
    horizon = 2000
    key = jax.random.PRNGKey(0)
    coins = jax.random.uniform(key, (horizon,))
    rate = float(jnp.mean(coins < thr))
    assert abs(rate - thr) < 0.03  # ~3 sigma at n=2000


def test_bfloat16_sparse_backends_run_and_are_close():
    """bf16 compute mode on the sparse graph backends (the kernels narrow
    their MXU inputs; accumulation stays f32)."""
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.sparse_graph import build_block_pattern
    from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
    from megacrn_tpu.ops.graph import dual_random_walk_supports

    n = 16
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=0)
    s1, s2 = dual_random_walk_supports(adj)
    packs = [(to_block_ell(s1), transpose_block_ell(s1)),
             (to_block_ell(s2), transpose_block_ell(s2))]
    pat = ((adj != 0) | (adj.T != 0)).astype(np.float32)
    np.fill_diagonal(pat, 1.0)
    pattern = build_block_pattern(pat)
    rs = np.random.RandomState(0)
    x = rs.randn(4, 4, n, 1).astype(np.float32)
    yc = rs.randn(4, 4, n, 1).astype(np.float32)
    for backend, sup in [("road_sparse", packs), ("sparse_meta", pattern)]:
        kw = dict(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8, horizon=4,
                  seq_len=4, graph_backend=backend)
        cfg32 = MegaCRNConfig(**kw)
        cfg16 = MegaCRNConfig(**kw, compute_dtype="bfloat16")
        params = megacrn.init_params(jax.random.PRNGKey(0), cfg32)
        o32 = megacrn.forward(params, x, yc, cfg32, road_supports=sup).output
        o16 = megacrn.forward(params, x, yc, cfg16, road_supports=sup).output
        np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                                   atol=0.05)


def test_dense_impl_stacked_matches_recursive_forward():
    import dataclasses
    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.models import megacrn

    cfg = MegaCRNConfig(num_nodes=11, seq_len=4, horizon=4, rnn_units=8,
                        mem_num=4, mem_dim=6, dense_impl="stacked")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 11, 1))
    ycov = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 11, 1))
    got = megacrn.forward(params, x, ycov, cfg)
    cfg_r = dataclasses.replace(cfg, dense_impl="recursive")
    want = megacrn.forward(params, x, ycov, cfg_r)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)
