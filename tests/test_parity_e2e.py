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

    res = run_parity(epochs=2, nodes=8, steps=300, seq=6, units=8, mem=4,
                     batch_size=32)
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
