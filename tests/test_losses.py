"""Loss parity vs torch goldens + mask-semantics property tests."""
import os

import numpy as np
import jax.numpy as jnp

from megacrn_tpu.ops import losses

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _blob():
    return dict(np.load(os.path.join(GOLDEN_DIR, "losses.npz")))


def test_dcrnn_masked_losses_match_torch():
    b = _blob()
    pred, true = b["in/pred"], b["in/true"]
    np.testing.assert_allclose(
        losses.masked_mae_loss(pred, true), b["out/masked_mae_loss"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.masked_mape_loss(pred, true), b["out/masked_mape_loss"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.masked_mse_loss(pred, true), b["out/masked_mse_loss"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.masked_rmse_loss(pred, true), b["out/masked_rmse_loss"], rtol=1e-6)


def test_nullval_masked_losses_match_torch():
    b = _blob()
    pred, true = b["in/pred"], b["in/true"]
    np.testing.assert_allclose(
        losses.masked_mae(pred, true, 1e-3), b["out/masked_mae_nullval"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.masked_mape(pred, true, 1e-3), b["out/masked_mape_nullval"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.masked_mse(pred, true, 1e-3), b["out/masked_mse_nullval"], rtol=1e-6)


def test_triplet_and_mse_match_torch():
    b = _blob()
    np.testing.assert_allclose(
        losses.triplet_margin_loss(b["in/anchor"], b["in/posv"], b["in/negv"]),
        b["out/triplet"], rtol=1e-6)
    np.testing.assert_allclose(
        losses.mse(b["in/anchor"], b["in/posv"]), b["out/mse_plain"], rtol=1e-6)


def test_mask_excludes_zero_targets():
    # Error at zero-target positions must not affect the loss.
    true = jnp.array([[1.0, 0.0, 2.0, 3.0]])
    pred_a = jnp.array([[1.5, 99.0, 2.5, 3.5]])
    pred_b = jnp.array([[1.5, -7.0, 2.5, 3.5]])
    assert float(losses.masked_mae_loss(pred_a, true)) == float(
        losses.masked_mae_loss(pred_b, true))
    # Mean rescaling: 3 of 4 valid, each |err| 0.5 -> sum/valid = 0.5.
    np.testing.assert_allclose(float(losses.masked_mae_loss(pred_a, true)), 0.5,
                               rtol=1e-6)


def test_all_zero_targets_yield_zero_loss():
    # Parity with the reference NaN trick: mask mean 0 -> NaN -> zeroed.
    true = jnp.zeros((2, 3))
    pred = jnp.ones((2, 3))
    assert float(losses.masked_mae_loss(pred, true)) == 0.0


def test_aux_losses_composite():
    b = _blob()
    got = losses.megacrn_aux_losses(
        b["in/anchor"], b["in/posv"], b["in/negv"], lamb=0.01, lamb1=0.01)
    want = 0.01 * b["out/triplet"] + 0.01 * b["out/mse_plain"]
    np.testing.assert_allclose(got, want, rtol=1e-6)
