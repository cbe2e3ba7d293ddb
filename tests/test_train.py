"""Training harness: optimizer parity, checkpoint round-trip, e2e mini-fit."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from megacrn_tpu.config import MegaCRNConfig, TrainConfig, train_config_for
from megacrn_tpu.data.datasets import build_synthetic
from megacrn_tpu.models import megacrn
from megacrn_tpu.train import checkpoint as ckpt
from megacrn_tpu.train.logs import RunDir
from megacrn_tpu.train.loop import fit
from megacrn_tpu.train.optim import lr_schedule, make_optimizer


def test_lr_schedule_multistep_parity():
    cfg = TrainConfig(lr=0.01, lr_milestones=(50, 100), lr_decay_ratio=0.1)
    sched = lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(499)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(501)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1001)), 1e-4, rtol=1e-6)


def test_adam_matches_torch_semantics():
    # One Adam step on a toy quadratic must match torch.optim.Adam exactly.
    import torch

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, -1.0, 2.0], np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=0.01, eps=1e-3)
    tw.grad = torch.tensor(g)
    opt.step()
    opt.step()  # second step with same grad

    jopt = optax.adam(0.01, eps=1e-3)
    state = jopt.init(jnp.asarray(w0))
    w = jnp.asarray(w0)
    for _ in range(2):
        updates, state = jopt.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = MegaCRNConfig(num_nodes=6, rnn_units=4, mem_num=3, mem_dim=4,
                        horizon=2, seq_len=2)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainConfig(), 10)
    opt_state = opt.init(params)
    path = os.path.join(tmp_path, "ckpt.npz")
    ckpt.save_checkpoint(path, params, opt_state,
                         metadata={"epoch": 3, "batches_seen": 42})
    p2, o2, meta = ckpt.load_checkpoint(path, params, opt_state)
    assert meta["epoch"] == 3 and meta["batches_seen"] == 42
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_orbax(tmp_path):
    cfg = MegaCRNConfig(num_nodes=6, rnn_units=4, mem_num=3, mem_dim=4,
                        horizon=2, seq_len=2)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainConfig(), 10)
    opt_state = opt.init(params)
    path = os.path.join(tmp_path, "ckpt_orbax")
    ckpt.save_checkpoint_orbax(path, params, opt_state,
                               metadata={"epoch": 3, "batches_seen": 42})
    # overwrite-in-place (best-val semantics) must be allowed
    ckpt.save_checkpoint_orbax(path, params, opt_state,
                               metadata={"epoch": 4, "batches_seen": 50})
    # generic loader auto-detects the directory format
    p2, o2, meta = ckpt.load_checkpoint(path, params, opt_state)
    assert meta["epoch"] == 4 and meta["batches_seen"] == 50
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_orbax_sharded_roundtrip(tmp_path):
    """Save mesh-sharded params, restore onto sharded templates: the
    multi-host checkpointing path exercised on the 8-device virtual mesh."""
    from megacrn_tpu.parallel.mesh import make_mesh, shard_params

    cfg = MegaCRNConfig(num_nodes=16, rnn_units=4, mem_num=3, mem_dim=4,
                        horizon=2, seq_len=2)
    params = shard_params(megacrn.init_params(jax.random.PRNGKey(0), cfg),
                          make_mesh(2, 4))
    path = os.path.join(tmp_path, "ckpt_sharded")
    ckpt.save_checkpoint_orbax(path, params, metadata={"epoch": 1})
    p2, o2, meta = ckpt.load_checkpoint_orbax(path, params)
    assert o2 is None and meta["epoch"] == 1
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(p2)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding, (ka, a.sharding, b.sharding)


def test_checkpoint_arrays_roundtrip(tmp_path):
    """Array-valued training state (PRNG key, per-column scaler stats) must
    survive losslessly through both backends (VERDICT round-1 item 10)."""
    cfg = MegaCRNConfig(num_nodes=6, rnn_units=4, mem_num=3, mem_dim=4,
                        horizon=2, seq_len=2)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    key = np.asarray(jax.random.PRNGKey(1234))
    mean = np.random.default_rng(0).normal(size=(6,))  # per-column (EXPY-TKY)
    std = np.random.default_rng(1).uniform(0.5, 2.0, size=(6,))
    arrays = {"rng_key": key, "scaler_mean_arr": mean, "scaler_std_arr": std}
    for save, path in [
            (ckpt.save_checkpoint, os.path.join(tmp_path, "c.npz")),
            (ckpt.save_checkpoint_orbax, os.path.join(tmp_path, "c_orbax"))]:
        save(path, params, metadata={"epoch": 1}, arrays=arrays)
        _, _, meta = ckpt.load_checkpoint(path, params)
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(meta["rng_key"], key)
        assert meta["rng_key"].dtype == key.dtype
        np.testing.assert_array_equal(meta["scaler_mean_arr"], mean)
        np.testing.assert_array_equal(meta["scaler_std_arr"], std)


def test_resume_is_step_identical(tmp_path):
    """A killed-and-resumed run must replay the uninterrupted trajectory
    exactly: restored params/opt state/batches_seen, the live PRNG key (so
    epoch key splits line up), and the (seed, epoch)-keyed loader reshuffle.
    """
    model_cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3, cl_decay_steps=20)
    train_cfg = TrainConfig(batch_size=16, epochs=4, patience=50, seed=7,
                            lr=0.01, lr_milestones=(100,))

    def make_data():
        return build_synthetic(num_nodes=8, num_steps=400, seq_len=3,
                               horizon=3, batch_size=16,
                               reshuffle_each_epoch=True, shuffle_seed=7)

    run_a = RunDir(str(tmp_path / "a"), "SYNTH", snapshot_sources=False,
                   timestring="fixed")
    res_a = fit(model_cfg, train_cfg, make_data(), run_a,
                test_every_epoch=False)

    run_b = RunDir(str(tmp_path / "b"), "SYNTH", snapshot_sources=False,
                   timestring="fixed")
    fit(model_cfg, train_cfg, make_data(), run_b, test_every_epoch=False,
        max_epochs=2)  # "killed" after 2 epochs
    run_b2 = RunDir(str(tmp_path / "b"), "SYNTH", snapshot_sources=False,
                    timestring="fixed")  # same dir -> same checkpoint
    res_b = fit(model_cfg, train_cfg, make_data(), run_b2,
                test_every_epoch=False, resume=True)

    assert res_b["epochs_run"] == res_a["epochs_run"] == 4
    np.testing.assert_allclose(res_b["best_val"], res_a["best_val"],
                               rtol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(res_a["params"])[0],
            jax.tree_util.tree_flatten_with_path(res_b["params"])[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_fit_end_to_end_reduces_loss(tmp_path):
    model_cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3, cl_decay_steps=50)
    train_cfg = TrainConfig(batch_size=16, epochs=3, patience=5, seed=0,
                            lr=0.01, lr_milestones=(100,))
    data = build_synthetic(num_nodes=8, num_steps=400, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False)
    assert result["epochs_run"] == 3
    assert np.isfinite(result["best_val"])
    assert result["test_metrics"]["mae"] < 20.0  # learned something vs ~45 mean
    # Artifact contract: all run files exist.
    assert os.path.exists(run.checkpoint_path)
    assert os.path.exists(run.logging_path)
    assert os.path.exists(run.epochlog_path)
    assert os.path.exists(run.metrics_path)


def test_expytky_preset_flags():
    tc = train_config_for("EXPYTKY")
    assert tc.pred_loss == "l1_normalized"
    assert tc.max_grad_norm is None
    assert tc.lamb1 == 0.0 and tc.reinit_xavier_uniform


def test_fit_two_layer_stack(tmp_path):
    """num_layers=2 through the full harness (the reference supports stacked
    cells, model/MegaCRN.py:53-89; goldens cover the forward — this covers
    training end-to-end)."""
    model_cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3, num_layers=2,
                              cl_decay_steps=50)
    train_cfg = TrainConfig(batch_size=16, epochs=2, patience=5, seed=0,
                            lr=0.01, lr_milestones=(100,))
    data = build_synthetic(num_nodes=8, num_steps=300, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    result = fit(model_cfg, train_cfg, data, run, test_every_epoch=False)
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_val"])
