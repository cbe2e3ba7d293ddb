"""Jitted train / eval steps for the MegaCRN training protocol.

One XLA program per step kind. The composite objective is
``L = L_pred + lamb * L_separate + lamb1 * L_compact``
(``model/traintest_MegaCRN.py:118-125``) with ``L_pred`` either the masked
MAE on the inverse-transformed scale (METR-LA/PEMS-BAY) or plain L1 on the
normalized scale (EXPY-TKY, ``model_EXPYTKY/traintest_MegaCRN.py:76-94``).

The eval step computes the DCRNN-style per-batch metrics at the 1-based
horizon slices 3/6/12 on-device (``model/traintest_MegaCRN.py:72-86``), so an
entire evaluation pass is B jitted calls + one host mean.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from megacrn_tpu.config import MegaCRNConfig, TrainConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.ops import losses
from megacrn_tpu.ops.scaling import inverse_transform


def composite_loss(out: megacrn.MegaCRNOutput, y: jnp.ndarray,
                   train_cfg: TrainConfig, scaler_mean, scaler_std):
    # Targets arrive as f32 loader arrays; align them with the model output
    # dtype so the f64 parity-control mode computes its losses fully in
    # double (the f32 -> f64 upcast of identical values is exact; a no-op
    # for the f32/bf16 production paths whose outputs are f32).
    y = y.astype(out.output.dtype)
    if train_cfg.pred_loss == "masked_mae_inv":
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        y_true = inverse_transform(y, scaler_std, scaler_mean)
        pred_loss = losses.masked_mae_loss(y_pred, y_true)
    elif train_cfg.pred_loss == "l1_normalized":
        pred_loss = jnp.mean(jnp.abs(out.output - y))  # nn.L1Loss parity
    else:
        raise ValueError(f"unknown pred_loss {train_cfg.pred_loss!r}")
    aux = losses.megacrn_aux_losses(out.query, out.pos, out.neg,
                                    train_cfg.lamb, train_cfg.lamb1)
    return pred_loss + aux


def split_support_arrays(road_supports):
    """Split a graph constant (StackedRoadPack / BlockELL pairs /
    BlockPattern) into (skeleton, [ndarray leaves]) so the big pack arrays
    enter jitted steps as RUNTIME ARGUMENTS instead of baked-in program
    constants. Embedding them as constants made the serialized program scale
    with nnz — at N=8192 the road pack blew the axon remote-compile HTTP
    body limit (HTTP 413). Static metadata (python ints like padded dims)
    stays in the skeleton so shapes remain trace-time constants."""
    import numpy as np

    arrays = []

    def walk(o):
        if isinstance(o, (jnp.ndarray, np.ndarray)) and o.ndim > 0:
            arrays.append(jnp.asarray(o))
            return ("__support_arr__", len(arrays) - 1)
        if isinstance(o, tuple) and hasattr(o, "_fields"):  # NamedTuple
            return type(o)(*[walk(v) for v in o])
        if isinstance(o, (list, tuple)):
            return type(o)(walk(v) for v in o)
        return o

    return walk(road_supports), arrays


def join_support_arrays(skeleton, arrays):
    """Inverse of ``split_support_arrays`` (runs inside the jit trace)."""

    def walk(o):
        if (isinstance(o, tuple) and len(o) == 2
                and o[0] == "__support_arr__"):
            return arrays[o[1]]
        if isinstance(o, tuple) and hasattr(o, "_fields"):
            return type(o)(*[walk(v) for v in o])
        if isinstance(o, (list, tuple)):
            return type(o)(walk(v) for v in o)
        return o

    return walk(skeleton)


def make_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    road_supports=None,
    donate: bool = False,
) -> Callable:
    """Returns jitted ``(params, opt_state, x, y, y_cov, batches_seen, rng)
    -> (params, opt_state, loss)``. ``batches_seen`` is a traced float driving
    the curriculum threshold, so step count does not trigger recompiles.
    ``road_supports`` feeds the sparse graph backends (BlockELL packs or a
    BlockPattern, per ``model_cfg.graph_backend``); its array leaves are
    threaded as runtime args (``split_support_arrays``) so the program size
    stays independent of nnz. ``donate`` aliases the params/opt-state inputs
    to the outputs (halves their HBM footprint on the hot path); leave False
    when the caller reuses the input pytrees after a step."""
    skel, sup_arrays = split_support_arrays(road_supports)

    def loss_fn(params, x, y, y_cov, batches_seen, rng, sup):
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True,
                              road_supports=join_support_arrays(skel, sup))
        return composite_loss(out, y, train_cfg, scaler_mean, scaler_std)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def _step(params, opt_state, x, y, y_cov, batches_seen, rng, sup):
        # Derive the per-step key INSIDE the jit (fold_in on the step
        # counter): host-side jax.random.split per step would serialize a
        # device round-trip chain through the axon tunnel.
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, y_cov, batches_seen, rng, sup)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_step(params, opt_state, x, y, y_cov, batches_seen, rng):
        return _step(params, opt_state, x, y, y_cov, batches_seen, rng,
                     sup_arrays)

    # Expose the jitted callable (+ its closed-over trailing args) so the
    # harness can AOT-lower it for compiled-memory telemetry
    # (train/loop.py:_log_compiled_memory).
    train_step._jitted = _step
    train_step._extra_args = (sup_arrays,)
    return train_step


# Horizon metric slices: 1-based steps (3, 6, 12) for 12-step datasets;
# truncated for shorter horizons.
def _metric_steps(horizon: int) -> Tuple[int, ...]:
    return tuple(s for s in (3, 6, 12) if s <= horizon)


def make_eval_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    return_predictions: bool = False,
    road_supports=None,
) -> Callable:
    """Returns jitted ``(params, x, y, y_cov) -> metrics dict`` computing the
    per-batch masked metrics of the reference eval loop
    (model/traintest_MegaCRN.py:60-86)."""
    steps = _metric_steps(model_cfg.horizon)
    skel, sup_arrays = split_support_arrays(road_supports)

    @jax.jit
    def _eval(params, x, y, y_cov, sup):
        out = megacrn.forward(params, x, y_cov, model_cfg, training=False,
                              road_supports=join_support_arrays(skel, sup))
        m = eval_metrics(out, y, train_cfg, scaler_mean, scaler_std, steps)
        if return_predictions:
            return m, inverse_transform(out.output, scaler_std, scaler_mean)
        return m

    def eval_step(params, x, y, y_cov):
        return _eval(params, x, y, y_cov, sup_arrays)

    return eval_step


def eval_metrics(out: megacrn.MegaCRNOutput, y: jnp.ndarray,
                 train_cfg: TrainConfig, scaler_mean, scaler_std,
                 steps: Tuple[int, ...]) -> dict:
    """The per-batch masked metrics of the reference eval loop
    (model/traintest_MegaCRN.py:60-86), as a pure function of the forward
    output — shared by the single-device eval step and the mesh eval path
    (which runs the forward through shard_map and the metrics via GSPMD)."""
    y = y.astype(out.output.dtype)  # see composite_loss
    y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
    y_true = inverse_transform(y, scaler_std, scaler_mean)
    loss = composite_loss(out, y, train_cfg, scaler_mean, scaler_std)
    m = {
        "loss": loss,
        "mae": losses.masked_mae_loss(y_pred, y_true),
        "mape": losses.masked_mape_loss(y_pred, y_true),
        "mse": losses.masked_mse_loss(y_pred, y_true),
    }
    for s in steps:
        sl_pred = y_pred[:, s - 1:s]
        sl_true = y_true[:, s - 1:s]
        m[f"mae_{s}"] = losses.masked_mae_loss(sl_pred, sl_true)
        m[f"mape_{s}"] = losses.masked_mape_loss(sl_pred, sl_true)
        m[f"mse_{s}"] = losses.masked_mse_loss(sl_pred, sl_true)
    return m


def summarize_eval(batch_metrics: list, horizon: int) -> dict:
    """Host-side aggregation: mean over batches; RMSE = sqrt(mean of MSEs)
    (model/traintest_MegaCRN.py:89-93)."""
    import numpy as np

    keys = batch_metrics[0].keys()
    acc = {k: float(np.mean([float(b[k]) for b in batch_metrics])) for k in keys}
    out = {"loss": acc["loss"], "mae": acc["mae"], "mape": acc["mape"],
           "rmse": float(np.sqrt(acc["mse"]))}
    for s in _metric_steps(horizon):
        out[f"mae_{s}"] = acc[f"mae_{s}"]
        out[f"mape_{s}"] = acc[f"mape_{s}"]
        out[f"rmse_{s}"] = float(np.sqrt(acc[f"mse_{s}"]))
    return out
