"""End-to-end train-to-train numerical parity against the reference torch
harness (VERDICT round-1 item 5): identical data, identical initial weights,
identical protocol -> matching val trajectories and final test metrics.

The full-size report lives in PARITY.md (tools/parity_train.py --report);
this asserts the same property at a CI-sized configuration.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_train_trajectories_match_reference():
    from tools.parity_train import run_parity

    res = run_parity(epochs=2, nodes=8, steps=300, seq=6, units=8,
                     mem_num=4, batch_size=32)
    t, j = res["torch"], res["jax"]
    assert len(t["val_trajectory"]) == len(j["val_trajectory"]) == 2
    for a, b in zip(t["val_trajectory"], j["val_trajectory"]):
        # Residual drift sources: torch clip_grad_norm_'s +1e-6 epsilon,
        # XLA-vs-aten reduction orders — compounding over optimizer steps.
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=5e-3)
        np.testing.assert_allclose(b["mae"], a["mae"], rtol=5e-3)
    for k in ("mae", "mape", "rmse"):
        np.testing.assert_allclose(j["test"][k], t["test"][k], rtol=1e-2)
    # Both frameworks actually learned (not parity-of-divergence).
    assert t["val_trajectory"][-1]["loss"] < t["val_trajectory"][0]["loss"]
    assert j["val_trajectory"][-1]["loss"] < j["val_trajectory"][0]["loss"]


def test_train_trajectories_match_reference_expytky_protocol():
    """The EXPY-TKY protocol flavor (L1-on-normalized, Adam eps 1e-8, no
    clip, torch-side double xavier_uniform init) — round-2 VERDICT item 3b."""
    from tools.parity_train import run_parity

    res = run_parity(epochs=2, nodes=8, steps=300, seq=6, units=8,
                     mem_num=4, batch_size=32, protocol="expytky")
    t, j = res["torch"], res["jax"]
    for a, b in zip(t["val_trajectory"], j["val_trajectory"]):
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=5e-3)
    for k in ("mae", "rmse"):
        np.testing.assert_allclose(j["test"][k], t["test"][k], rtol=1e-2)


def test_float64_trajectories_bit_near():
    """The precision-control mode (round-4 VERDICT item 2): in double, both
    frameworks' val trajectories must be bit-near (<=1e-9 rel after an
    epoch at a stable step size) — regression guard for the f64 plumbing
    (compute_dtype threading, target-dtype alignment, torch-exact clip).
    Subprocess-hermetic: jax_enable_x64 must not leak into other tests."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parity_train.py"),
         "--nodes", "8", "--epochs", "1", "--steps", "200", "--units", "8",
         "--batch", "32", "--float64", "--missing_rate", "0",
         "--min_speed", "20"],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.splitlines()
    start = lines.index("{")  # the result JSON block
    res = json.loads("\n".join(lines[start:]))
    t, j = res["torch"], res["jax"]
    for a, b in zip(t["val_trajectory"], j["val_trajectory"]):
        rel = abs(a["loss"] - b["loss"]) / abs(a["loss"])
        assert rel <= 1e-9, f"f64 trajectories not glued: rel {rel}"
    for k in ("mae", "mape", "rmse"):
        a, b = t["test"][k], j["test"][k]
        assert abs(a - b) / abs(a) <= 1e-9


def test_gts_train_trajectories_match_reference():
    """GTS train-to-train parity (Gumbel noise zeroed on both sides,
    curriculum off) — round-2 VERDICT item 4."""
    import argparse

    from tools.parity_train_gts import run_parity as run_gts

    args = argparse.Namespace(epochs=2, nodes=8, steps=260, seq=4, units=8,
                              diffusion=2, knn_k=2, batch=16, lr=0.005)
    res = run_gts(args)
    t, j = res["torch"], res["jax"]
    assert len(t["val_trajectory"]) == len(j["val_trajectory"]) == 2
    for a, b in zip(t["val_trajectory"], j["val_trajectory"]):
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=5e-3)
    for k in ("mae", "rmse"):
        np.testing.assert_allclose(j["test"][k], t["test"][k], rtol=1e-2)


def test_megacrnx_train_trajectories_match_reference():
    """MegaCRNx train-to-train parity (fully deterministic protocol:
    no curriculum, shuffle=False) — round-2 VERDICT item 4."""
    import argparse

    from tools.parity_train_megacrnx import run_parity as run_x

    args = argparse.Namespace(epochs=2, nodes=8, steps=260, his_len=4,
                              seq_len=4, units=8, mem_num=4, mem_dim=8,
                              batch=16, lr=1e-3, lamb=0.01, lamb1=0.01,
                              loss="MaskMAE", val_ratio=0.125, memory=True,
                              meta=True, decoder="stepwise")
    res = run_x(args)
    t, j = res["torch"], res["jax"]
    assert len(t["val_trajectory"]) == len(j["val_trajectory"]) == 2
    for a, b in zip(t["val_trajectory"], j["val_trajectory"]):
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=5e-3)
    for k in ("mae", "rmse"):
        np.testing.assert_allclose(j["test"][k], t["test"][k], rtol=1e-2)
