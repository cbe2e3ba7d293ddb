"""MegaCRNx training harness: windowing parity + e2e training of the three
ablation flag combos (model_futurework/traintest_MegaCRNx.py protocol)."""
import numpy as np
import pytest

from megacrn_tpu.data.windowing import ratio_windows
from megacrn_tpu.cli.traintest_megacrnx import main

HIS, SEQ, RATIO = 4, 3, 0.8


def _reference_getxsystime(data, data_time, mode):
    """Literal transcription of getXSYSTIME
    (traintest_MegaCRNx.py:38-55) for equality checking."""
    train_num = int(data.shape[0] * RATIO)
    XS, YS, YT = [], [], []
    if mode == "train":
        rng = range(train_num - SEQ - HIS + 1)
    else:
        rng = range(train_num - HIS, data.shape[0] - SEQ - HIS + 1)
    for i in rng:
        XS.append(data[i:i + HIS])
        YS.append(data[i + HIS:i + HIS + SEQ])
        YT.append(data_time[i + HIS:i + HIS + SEQ])
    XS, YS, YT = np.array(XS), np.array(YS), np.array(YT)
    return XS[..., None], YS[..., None], YT[..., None]


def test_ratio_windows_matches_reference_loop():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 5)).astype(np.float32)
    dtime = rng.uniform(size=(50, 5)).astype(np.float32)
    for mode in ("train", "test"):
        xs, ys, yc = ratio_windows(data, dtime, HIS, SEQ, RATIO, mode)
        rx, ry, rt = _reference_getxsystime(data, dtime, mode)
        np.testing.assert_array_equal(xs, rx)
        np.testing.assert_array_equal(ys, ry)
        np.testing.assert_array_equal(yc, rt)


BASE = ["--dataset", "SYNTH", "--num_nodes", "12", "--synth_steps", "300",
        "--his_len", "4", "--seq_len", "4", "--hiddenunits", "8",
        "--mem_num", "4", "--mem_dim", "8", "--epoch", "2",
        "--batch_size", "16", "--seed", "1"]


@pytest.mark.parametrize("memory,meta,decoder", [
    ("True", "True", "stepwise"),
    ("True", "False", "sequence"),
    ("True", "False", "stepwise"),
])
def test_cli_trains_ablation_combo(tmp_path, memory, meta, decoder):
    result = main(BASE + ["--save_dir", str(tmp_path), "--memory", memory,
                          "--meta", meta, "--decoder", decoder])
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_val"])
    assert np.isfinite(result["test_metrics"]["mae"])
    assert len(result["test_metrics"]["per_step"]) == 4


def test_cli_loss_mae_flavor(tmp_path):
    result = main(BASE + ["--save_dir", str(tmp_path), "--loss", "MAE"])
    assert np.isfinite(result["test_metrics"]["mae"])


def test_mesh_train_step_matches_single_device():
    """MegaCRNx (the third model family) through the explicit shard_map DP
    layer: mesh update == single-device update, including the global
    MaskMAE normalization with sub-null targets concentrated in one batch
    shard (mask density differs across shards)."""
    import jax
    import jax.numpy as jnp
    import optax

    from megacrn_tpu.models import megacrnx
    from megacrn_tpu.parallel.api import make_megacrnx_mesh_train_step
    from megacrn_tpu.parallel.mesh import make_mesh
    from megacrn_tpu.train.megacrnx_loop import (MegaCRNxTrainConfig,
                                                 make_megacrnx_train_step)

    cfg = megacrnx.MegaCRNxConfig(num_nodes=10, input_dim=1, output_dim=1,
                                  horizon=3, seq_len=3, rnn_units=8,
                                  mem_num=4, mem_dim=8)
    tcfg = MegaCRNxTrainConfig(batch_size=8, lr=1e-3)
    params = megacrnx.init_params(jax.random.PRNGKey(0), cfg)
    # SGD for the parity check: its update is proportional to the gradient,
    # so float-reassociation noise stays at noise scale (a first Adam step
    # is lr*sign(g) — near-zero grads flip sign and blow the comparison).
    opt = optax.sgd(tcfg.lr)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = np.asarray(jax.random.normal(ks[0], (8, 3, 10, 1)), np.float32)
    y = np.array(jax.random.uniform(ks[1], (8, 3, 10, 1)) * 50, np.float32)
    y[:3] = 0.0  # below null_val=1e-3 — masked rows land in one shard
    yc = np.asarray(jax.random.uniform(ks[2], (8, 3, 10, 1)), np.float32)

    base = make_megacrnx_train_step(cfg, tcfg, opt, 1.5, 2.0, donate=False)
    p1, _, v1 = base(params, opt.init(params), x, y, yc)

    mesh = make_mesh(2, 4)
    step = make_megacrnx_mesh_train_step(cfg, tcfg, opt, mesh, 1.5, 2.0,
                                         donate=False)
    p2, _, v2 = step(params, opt.init(params), x, y, yc)
    for a, b in zip(v1, v2):
        np.testing.assert_allclose(float(b), float(a), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_cli_trains_on_mesh(tmp_path):
    """fit_megacrnx(mesh=...) e2e from the CLI: full batches train through
    the shard_map DP step, the drop_last=False tail batch falls back to the
    single-device step (all three families now train distributed)."""
    result = main(BASE + ["--save_dir", str(tmp_path),
                          "--mesh_data", "2", "--mesh_node", "4"])
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_val"])
    assert np.isfinite(result["test_metrics"]["mae"])


def test_training_reduces_loss(tmp_path):
    """The harness learns: later-epoch val beats epoch-0 val on synthetic."""
    import json, os

    result = main(BASE + ["--save_dir", str(tmp_path), "--epoch", "6",
                          "--lr", "0.002"])
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("SYNTH")]
    metrics_path = os.path.join(tmp_path, run_dirs[0], "metrics.jsonl")
    vals = [json.loads(l)["val_loss"] for l in open(metrics_path)
            if "val_loss" in json.loads(l)]
    assert min(vals[1:]) < vals[0]
    assert result["best_val"] == min(vals)
