"""GTS harness: BCE parity and a mini end-to-end fit."""
import os

import numpy as np
import jax.numpy as jnp

from megacrn_tpu.config import GTSConfig, TrainConfig
from megacrn_tpu.data.datasets import build_from_series
from megacrn_tpu.data.graph_prior import cosine_knn_graph
from megacrn_tpu.data.synthetic import synthetic_speed_series
from megacrn_tpu.train.gts_loop import bce, fit_gts
from megacrn_tpu.train.logs import RunDir


def test_bce_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    p = rng.rand(50).astype(np.float32)
    t = (rng.rand(50) < 0.3).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    np.testing.assert_allclose(float(bce(jnp.asarray(p), jnp.asarray(t))),
                               want, rtol=1e-5)


def test_fit_gts_end_to_end(tmp_path):
    values, index = synthetic_speed_series(300, 10)
    data = build_from_series(values, index, seq_len=4, horizon=4,
                             batch_size=16)
    train_feas = values[:210]
    knn = cosine_knn_graph(train_feas, 3)
    cfg = GTSConfig(num_nodes=10, input_dim=2, output_dim=1, horizon=4,
                    seq_len=4, rnn_units=8, max_diffusion_step=2,
                    train_series_len=210, knn_k=3)
    tcfg = TrainConfig(batch_size=16, epochs=2, patience=5, seed=0, lr=0.005)
    run = RunDir(str(tmp_path), "SYNTH", model_name="GTS",
                 snapshot_sources=False)
    result = fit_gts(cfg, tcfg, data, train_feas, knn, run, max_epochs=2)
    assert np.isfinite(result["best_val"])
    assert result["test_metrics"]["mae"] < 30
    assert os.path.exists(run.checkpoint_path)
