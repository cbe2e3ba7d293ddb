"""Masked losses with bit-level parity to the reference torch semantics.

Two families, both reproduced exactly:

* DCRNN-style ``*_loss`` (``model/utils.py:126-160``): mask = (y != 0),
  normalised by its mean **without** NaN-fixing the mask (an all-zero target
  yields NaN mask -> loss NaN -> zeroed -> 0), NaN-in-loss zeroed, then mean.
* ``null_val`` variants (``model/utils.py:81-123``): mask = (y > null_val)
  (or ~isnan for NaN null), mask itself NaN-fixed after normalisation.

Plus the auxiliary memory losses used by the training objective
(``model/traintest_MegaCRN.py:121-125``): a torch-parity triplet margin loss
(margin 1.0, p=2, eps=1e-6 added to the difference as in
``torch.nn.functional.pairwise_distance``) and plain MSE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NAN_FIX = lambda t: jnp.where(jnp.isnan(t), jnp.zeros_like(t), t)


def _dcrnn_mask(y_true: jnp.ndarray) -> jnp.ndarray:
    mask = (y_true != 0).astype(jnp.float32)
    # Deliberately no NaN fix here: parity with model/utils.py:127-128.
    return mask / jnp.mean(mask)


def masked_mae_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """model/utils.py:126-133."""
    loss = jnp.abs(y_pred - y_true) * _dcrnn_mask(y_true)
    return jnp.mean(_NAN_FIX(loss))


def masked_mae_sums(y_pred: jnp.ndarray, y_true: jnp.ndarray):
    """Distributive decomposition of ``masked_mae_loss``: returns
    ``(sum(nanfix(|err| * mask)), sum(mask))`` with the binary (y != 0) mask.

    ``masked_mae_loss == num / den`` whenever ``den > 0`` and 0 otherwise
    (mask-count normalisation cancels the element count), so batch shards can
    each compute local sums, ``psum`` both over the data axis, and divide once
    — the global masked mean, exact even when mask density differs across
    shards (unlike a pmean of per-shard masked means).
    """
    mask = (y_true != 0).astype(jnp.float32)
    num = jnp.sum(_NAN_FIX(jnp.abs(y_pred - y_true) * mask))
    return num, jnp.sum(mask)


def masked_mape_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """model/utils.py:135-142. The reference divides by zero (inf * 0 mask ->
    NaN -> 0); here the divisor is guarded so zero-``y_true`` elements never
    produce inf — they are masked to 0 either way, so the value is identical
    while eager CPU execution stays RuntimeWarning-free (real div-by-zero
    regressions elsewhere remain visible)."""
    mask = _dcrnn_mask(y_true)
    safe = jnp.where(y_true != 0, y_true, 1.0)
    loss = jnp.abs((y_true - y_pred) / safe) * mask
    return jnp.mean(_NAN_FIX(loss))


def masked_mse_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """model/utils.py:153-160."""
    loss = jnp.square(y_true - y_pred) * _dcrnn_mask(y_true)
    return jnp.mean(_NAN_FIX(loss))


def masked_rmse_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """model/utils.py:144-151 (sqrt of the masked-MSE mean)."""
    return jnp.sqrt(masked_mse_loss(y_pred, y_true))


def _null_mask(labels: jnp.ndarray, null_val: float) -> jnp.ndarray:
    if null_val != null_val:  # NaN sentinel
        mask = ~jnp.isnan(labels)
    else:
        mask = labels > null_val
    mask = mask.astype(jnp.float32)
    mask = mask / jnp.mean(mask)
    return _NAN_FIX(mask)  # parity: model/utils.py:88 fixes the mask too


def masked_mae(preds, labels, null_val: float = 1e-3):
    """model/utils.py:98-109."""
    loss = jnp.abs(preds - labels) * _null_mask(labels, null_val)
    return jnp.mean(_NAN_FIX(loss))


def masked_mae_null_sums(preds, labels, null_val: float = 1e-3):
    """Distributive decomposition of ``masked_mae`` (the null_val flavor),
    mirroring ``masked_mae_sums``: returns ``(sum(nanfix(|err| * mask)),
    sum(mask))`` with the binary ``labels > null_val`` mask, so shards can
    psum both and divide once for the exact global masked mean."""
    if null_val != null_val:  # NaN sentinel
        mask = ~jnp.isnan(labels)
    else:
        mask = labels > null_val
    mask = mask.astype(jnp.float32)
    num = jnp.sum(_NAN_FIX(jnp.abs(preds - labels) * mask))
    return num, jnp.sum(mask)


def masked_mse(preds, labels, null_val: float = 1e-3):
    """model/utils.py:81-92."""
    loss = jnp.square(preds - labels) * _null_mask(labels, null_val)
    return jnp.mean(_NAN_FIX(loss))


def masked_rmse(preds, labels, null_val: float = 1e-3):
    """model/utils.py:94-95."""
    return jnp.sqrt(masked_mse(preds, labels, null_val))


def masked_mape(preds, labels, null_val: float = 1e-3):
    """model/utils.py:112-123."""
    loss = (jnp.abs(preds - labels) / labels) * _null_mask(labels, null_val)
    return jnp.mean(_NAN_FIX(loss))


def triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss parity (p=2, swap=False, mean reduction).

    torch computes ``d(a, b) = ||a - b + eps||_2`` over the last dim
    (F.pairwise_distance adds the scalar eps to the difference), then
    ``mean(relu(d_ap - d_an + margin))`` over all leading dims. Used with
    stop-gradient pos/neg as the "separate" loss
    (model/traintest_MegaCRN.py:121-123).
    """
    d_ap = jnp.linalg.norm(anchor - positive + eps, axis=-1)
    d_an = jnp.linalg.norm(anchor - negative + eps, axis=-1)
    return jnp.mean(jax.nn.relu(d_ap - d_an + margin))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """nn.MSELoss parity — the "compact" loss (model/traintest_MegaCRN.py:124)."""
    return jnp.mean(jnp.square(a - b))


def megacrn_aux_losses(query, pos, neg, lamb: float, lamb1: float):
    """The contrastive pair of auxiliary losses on the memory read.

    pos/neg are stop-gradiented at the loss site exactly as the harness
    ``.detach()``s them (model/traintest_MegaCRN.py:123-124).
    Returns ``lamb * separate + lamb1 * compact``.
    """
    pos = jax.lax.stop_gradient(pos)
    neg = jax.lax.stop_gradient(neg)
    separate = triplet_margin_loss(query, pos, neg, margin=1.0)
    compact = mse(query, pos)
    return lamb * separate + lamb1 * compact
