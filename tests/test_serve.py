"""Serving path: checkpoint -> predictor -> batch + streaming inference."""
import numpy as np
import jax

from megacrn_tpu.config import MegaCRNConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.serve import Predictor, StreamingForecaster
from megacrn_tpu.train import checkpoint as ckpt

CFG = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                    horizon=3, seq_len=4, use_curriculum_learning=False)


def _predictor(tmp_path, mean=50.0, std=10.0):
    params = megacrn.init_params(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "model.npz")
    ckpt.save_checkpoint(path, params,
                         metadata={"scaler_mean": mean, "scaler_std": std})
    return Predictor.from_checkpoint(path, CFG, max_batch=4), params


def test_predict_matches_manual_forward(tmp_path):
    pred, params = _predictor(tmp_path)
    rng = np.random.RandomState(0)
    x = (rng.rand(2, 4, 8, 1) * 70).astype(np.float32)
    ycov = rng.randn(2, 3, 8, 1).astype(np.float32)
    got = pred.predict(x, ycov)
    xn = (x - 50.0) / 10.0
    want = np.asarray(
        megacrn.forward(params, xn, ycov, CFG).output) * 10.0 + 50.0
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert got.shape == (2, 3, 8, 1)


def test_predict_chunks_and_pads_requests(tmp_path):
    pred, _ = _predictor(tmp_path)
    rng = np.random.RandomState(1)
    x = (rng.rand(7, 4, 8, 1) * 70).astype(np.float32)  # 7 = 4 + padded 3
    out = pred.predict(x)
    # Per-row results identical to individual predictions (no padding bleed).
    single = np.concatenate([pred.predict(x[i:i + 1]) for i in range(7)])
    np.testing.assert_allclose(out, single, atol=1e-5)


def test_streaming_forecaster_warms_up_then_forecasts(tmp_path):
    pred, _ = _predictor(tmp_path)
    stream = StreamingForecaster(pred)
    rng = np.random.RandomState(2)
    outs = []
    for t in range(6):
        outs.append(stream.push(rng.rand(8).astype(np.float32) * 70))
    assert outs[0] is None and outs[2] is None  # warming (seq_len=4)
    assert outs[3] is not None and outs[3].shape == (3, 8, 1)
    assert np.all(np.isfinite(outs[5]))


def test_predictor_sparse_backend():
    """A road_sparse-trained config serves through the same Predictor:
    road_supports threads into the jitted forward as runtime args, and the
    forecasts match the dense-layout forward on the same weights."""
    import jax
    import jax.numpy as jnp

    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm_ell_node import build_stacked_node_ell
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.ops.graph import dual_random_walk_supports
    from megacrn_tpu.serve import Predictor

    n = 20
    adj = synthetic_road_adjacency(n, avg_degree=4, seed=1)
    s1, s2 = dual_random_walk_supports(adj)
    cfg = MegaCRNConfig(num_nodes=n, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3, graph_backend="road_sparse")
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    packs = build_stacked_node_ell([s1, s2])
    pred = Predictor(params, cfg, scaler_mean=40.0, scaler_std=8.0,
                     max_batch=4, road_supports=packs)
    rs = np.random.RandomState(0)
    x = rs.rand(2, 3, n, 1).astype(np.float32) * 60
    out = pred.predict(x)
    assert out.shape == (2, 3, n, 1)
    assert np.isfinite(out).all()

    # Same forecast as the raw forward on manually normalized inputs.
    xn = (x - 40.0) / 8.0
    ref = megacrn.forward(params, jnp.asarray(xn), jnp.zeros((2, 3, n, 1)),
                          cfg, road_supports=packs).output
    np.testing.assert_allclose(out, np.asarray(ref) * 8.0 + 40.0,
                               atol=1e-4, rtol=1e-4)
