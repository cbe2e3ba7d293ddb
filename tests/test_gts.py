"""GTS baseline: activation parity vs reference goldens + behavior tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from megacrn_tpu.config import GTSConfig
from megacrn_tpu.data.graph_prior import cosine_knn_graph
from megacrn_tpu.models import gts
from megacrn_tpu.nn.dcgru import random_walk_support

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load():
    blob = dict(np.load(os.path.join(GOLDEN_DIR, "gts_small.npz")))
    (n, cin, cout, horizon, seq_len, units, layers, k, tlen) = blob["meta/config"]
    cfg = GTSConfig(num_nodes=int(n), input_dim=int(cin), output_dim=int(cout),
                    horizon=int(horizon), seq_len=int(seq_len),
                    rnn_units=int(units), num_layers=int(layers),
                    max_diffusion_step=int(k), train_series_len=int(tlen),
                    use_curriculum_learning=False)

    def arr(key):
        return jnp.asarray(blob[key])

    params = {
        "conv1": {"W": arr("conv1/W"), "b": arr("conv1/b")},
        "conv2": {"W": arr("conv2/W"), "b": arr("conv2/b")},
        "fc": {"W": arr("fc/W"), "b": arr("fc/b")},
        "fc_out": {"W": arr("fc_out/W"), "b": arr("fc_out/b")},
        "fc_cat": {"W": arr("fc_cat/W"), "b": arr("fc_cat/b")},
        "bn1": {"scale": arr("bn1/scale"), "bias": arr("bn1/bias")},
        "bn2": {"scale": arr("bn2/scale"), "bias": arr("bn2/bias")},
        "bn3": {"scale": arr("bn3/scale"), "bias": arr("bn3/bias")},
        "encoder": [{
            "gate": {"W": arr(f"encoder/{i}/gate/W"),
                     "b": arr(f"encoder/{i}/gate/b")},
            "candidate": {"W": arr(f"encoder/{i}/candidate/W"),
                          "b": arr(f"encoder/{i}/candidate/b")},
        } for i in range(cfg.num_layers)],
        "decoder": [{
            "gate": {"W": arr(f"decoder/{i}/gate/W"),
                     "b": arr(f"decoder/{i}/gate/b")},
            "candidate": {"W": arr(f"decoder/{i}/candidate/W"),
                          "b": arr(f"decoder/{i}/candidate/b")},
        } for i in range(cfg.num_layers)],
        "proj": {"W": arr("proj/W"), "b": arr("proj/b")},
    }
    bn_state = {f"bn{i}": {"mean": arr(f"bn{i}/mean"), "var": arr(f"bn{i}/var")}
                for i in (1, 2, 3)}
    return cfg, params, bn_state, blob


def test_gts_forward_matches_reference():
    cfg, params, bn_state, blob = _load()
    # Golden x is the reference's flattened time-major layout
    # (T, B, N*C) -> ours is (B, T, N, C).
    t, b = cfg.seq_len, 2
    x_flat = blob["in/x"]
    x = x_flat.reshape(t, b, cfg.num_nodes, cfg.input_dim).transpose(1, 0, 2, 3)
    out = gts.forward(params, bn_state, jnp.asarray(x),
                      jnp.asarray(blob["in/node_feas"]), cfg,
                      training=False, gumbel_noise=False)
    np.testing.assert_allclose(
        np.asarray(out.adj_prob), blob["out/adj_prob"], atol=2e-5, rtol=1e-4)
    # Golden output is (horizon, B, N*out); ours (B, horizon, N, out).
    want = blob["out/output"].reshape(cfg.horizon, b, cfg.num_nodes,
                                      cfg.output_dim).transpose(1, 0, 2, 3)
    np.testing.assert_allclose(np.asarray(out.output), want,
                               atol=5e-5, rtol=1e-4)


def test_random_walk_support_rows_normalised():
    adj = jnp.asarray(np.random.RandomState(0).rand(6, 6) < 0.4, jnp.float32)
    s = random_walk_support(adj)
    # s = (D^-1 (A+I))^T, so columns sum to 1.
    np.testing.assert_allclose(np.asarray(s.sum(0)), np.ones(6), atol=1e-6)


def test_gumbel_straight_through_is_onehot_with_soft_gradient():
    logits = jnp.asarray([[2.0, 1.0], [0.1, 3.0]])
    y = gts.gumbel_softmax_hard(logits, 0.5, None)
    np.testing.assert_array_equal(np.asarray(y), [[1.0, 0.0], [0.0, 1.0]])

    def f(l):
        return gts.gumbel_softmax_hard(l, 0.5, None).sum()

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))  # gradient flows via soft path


def test_cosine_knn_graph_matches_sklearn():
    from sklearn.neighbors import kneighbors_graph

    series = np.random.RandomState(3).randn(50, 12).astype(np.float32)
    ours = cosine_knn_graph(series, k=4)
    want = np.asarray(
        kneighbors_graph(series.T, 4, metric="cosine").todense(),
        dtype=np.float32)
    np.testing.assert_array_equal(ours, want)
    assert ours.sum() == 12 * 4 and np.trace(ours) == 0


def test_gts_init_and_train_forward_runs():
    cfg = GTSConfig(num_nodes=8, input_dim=2, output_dim=1, horizon=3,
                    seq_len=4, rnn_units=6, max_diffusion_step=2,
                    train_series_len=40)
    params, bn_state = gts.init_params(jax.random.PRNGKey(0), cfg)
    b = 3
    x = np.random.randn(b, 4, 8, 2).astype(np.float32)
    labels = np.random.randn(b, 3, 8, 1).astype(np.float32)
    feas = np.random.randn(40, 8).astype(np.float32)
    out = gts.forward(params, bn_state, x, feas, cfg, labels=labels,
                      batches_seen=0.0, rng=jax.random.PRNGKey(1),
                      training=True)
    assert out.output.shape == (b, 3, 8, 1)
    assert np.all(np.isfinite(np.asarray(out.output)))
    # BN running stats updated in training mode.
    assert not np.allclose(np.asarray(out.bn_state["bn1"]["mean"]),
                           np.asarray(bn_state["bn1"]["mean"]))


def test_gts_bfloat16_mode_tracks_f32_and_trains():
    """compute_dtype="bfloat16" (the MXU speed mode) must produce outputs
    close to the f32 forward on identical weights (bf16 matmul-input
    noise only) and train to a finite decreasing loss."""
    import optax

    from megacrn_tpu.config import GTSConfig, TrainConfig
    from megacrn_tpu.models import gts
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.train.gts_loop import make_gts_train_step

    kw = dict(num_nodes=10, input_dim=1, output_dim=1, horizon=3, seq_len=4,
              rnn_units=8, max_diffusion_step=2, train_series_len=60,
              knn_k=3, embedding_dim=16, use_curriculum_learning=False)
    cfg32 = GTSConfig(**kw)
    cfg16 = GTSConfig(**kw, compute_dtype="bfloat16")
    params, bn = gts.init_params(jax.random.PRNGKey(0), cfg32)
    rng = np.random.RandomState(0)
    feas = jnp.asarray(rng.randn(60, 10).astype(np.float32))
    x = jnp.asarray(rng.randn(4, 4, 10, 1).astype(np.float32))
    out32 = gts.forward(params, bn, x, feas, cfg32, training=False,
                        gumbel_noise=False)
    out16 = gts.forward(params, bn, x, feas, cfg16, training=False,
                        gumbel_noise=False)
    assert out16.output.dtype == jnp.float32
    # Same sampled graph (logits/softmax stay f32 in both modes)...
    np.testing.assert_array_equal(np.asarray(out16.adj_sample),
                                  np.asarray(out32.adj_sample))
    # ...and outputs within bf16 matmul-input noise.
    np.testing.assert_allclose(np.asarray(out16.output),
                               np.asarray(out32.output), atol=0.05, rtol=0.1)

    tcfg = TrainConfig(batch_size=4, lr=5e-3)
    opt = optax.adam(tcfg.lr, eps=1e-3)
    feas_np = np.asarray(feas)
    step = make_gts_train_step(cfg16, tcfg, opt, 0.0, 1.0, feas_np,
                               cosine_knn_graph(feas_np, 3))
    y = jnp.asarray(rng.randn(4, 3, 10, 1).astype(np.float32))
    p, b, st = params, bn, opt.init(params)
    losses = []
    for i in range(5):
        p, b, st, loss = step(p, b, st, x, y, jnp.float32(i),
                              jax.random.PRNGKey(1))
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
