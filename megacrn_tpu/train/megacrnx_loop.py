"""MegaCRNx training harness: the model_futurework protocol as a library fn.

The ablation-generation harness differs from the canonical one
(``model_futurework/traintest_MegaCRNx.py``) in every place that matters:

* ratio-based windowing, NO shuffle anywhere (``:123-125``), chronological
  val split of the trainval windows (``:120-122``);
* the inverse transform is applied to predictions INSIDE the loss
  (``:98,147``) — only x is scaled, targets stay on the raw scale
  (``:116,190``);
* no curriculum learning, no grad clip, no LR schedule — plain ``Adam(lr)``
  (``:126``);
* loss flavors ``MaskMAE`` (``masked_mae`` with ``null_val=1e-3``,
  ``model_futurework/utils.py:98-109``) or ``MAE`` (``nn.L1Loss``), plus the
  usual lamb/lamb1 memory losses (``:148-151``);
* epoch losses are SAMPLE-weighted means (``loss.item() * B / n``,
  ``:103-109,154-159``), not per-batch means;
* final numpy metrics all-steps + per-step over the vstacked predictions
  (``:199-207``).

TPU notes: the whole step is one jitted XLA program with donated
params/opt-state; the short tail batch (torch ``drop_last=False`` parity)
costs exactly one extra compile.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from megacrn_tpu.data.loader import BatchLoader
from megacrn_tpu.models import megacrnx
from megacrn_tpu.ops import losses, metrics
from megacrn_tpu.train import checkpoint as ckpt
from megacrn_tpu.train.logs import RunDir, echo_hparams
from megacrn_tpu.ops.scaling import inverse_transform


@dataclasses.dataclass(frozen=True)
class MegaCRNxTrainConfig:
    """Reference defaults: traintest_MegaCRNx.py:210-233."""
    loss: str = "MaskMAE"  # "MAE" | "MaskMAE"
    epochs: int = 200
    batch_size: int = 64
    lr: float = 1e-3
    patience: int = 10
    lamb: float = 0.01
    lamb1: float = 0.01
    trainval_ratio: float = 0.8
    val_ratio: float = 0.125
    seed: int = 100


def _component_losses(out: megacrnx.MegaCRNxOutput, y_raw: jnp.ndarray,
                      loss_name: str, mean, std):
    """(loss1, loss2, loss3) of traintest_MegaCRNx.py:146-151: prediction
    loss on the inverse-transformed scale vs the RAW target, plus the
    detached triplet/compact memory losses."""
    y_pred = inverse_transform(out.output, std, mean)
    if loss_name == "MaskMAE":
        loss1 = losses.masked_mae(y_pred, y_raw, null_val=1e-3)
    elif loss_name == "MAE":
        loss1 = jnp.mean(jnp.abs(y_pred - y_raw))
    else:
        raise ValueError(f"unknown loss {loss_name!r}")
    if out.query is None:  # memory_type=False ablation: no memory losses
        zero = jnp.zeros((), y_pred.dtype)
        return loss1, zero, zero
    pos = jax.lax.stop_gradient(out.pos)
    neg = jax.lax.stop_gradient(out.neg)
    loss2 = losses.triplet_margin_loss(out.query, pos, neg, margin=1.0)
    loss3 = losses.mse(out.query, pos)
    return loss1, loss2, loss3


def make_megacrnx_train_step(
    model_cfg: megacrnx.MegaCRNxConfig,
    train_cfg: MegaCRNxTrainConfig,
    optimizer: optax.GradientTransformation,
    scaler_mean: float,
    scaler_std: float,
    donate: bool = True,
) -> Callable:
    """Jitted ``(params, opt_state, x, y_raw, y_cov) -> (params, opt_state,
    (loss, loss1, loss2, loss3))``. Deterministic — MegaCRNx has no
    scheduled sampling."""

    def loss_fn(params, x, y, y_cov):
        out = megacrnx.forward(params, x, y_cov, model_cfg)
        l1, l2, l3 = _component_losses(out, y, train_cfg.loss,
                                       scaler_mean, scaler_std)
        total = l1 + train_cfg.lamb * l2 + train_cfg.lamb1 * l3
        return total, (l1, l2, l3)

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, x, y, y_cov):
        (total, (l1, l2, l3)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, y_cov)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (total, l1, l2, l3)

    return step


def make_megacrnx_eval_step(
    model_cfg: megacrnx.MegaCRNxConfig,
    train_cfg: MegaCRNxTrainConfig,
    scaler_mean: float,
    scaler_std: float,
) -> Callable:
    """Jitted ``(params, x, y_raw, y_cov) -> ((loss, l1, l2, l3),
    y_pred_inverse)`` — the evaluateModel body (traintest_MegaCRNx.py:95-108)."""

    @jax.jit
    def step(params, x, y, y_cov):
        out = megacrnx.forward(params, x, y_cov, model_cfg)
        l1, l2, l3 = _component_losses(out, y, train_cfg.loss,
                                       scaler_mean, scaler_std)
        total = l1 + train_cfg.lamb * l2 + train_cfg.lamb1 * l3
        return (total, l1, l2, l3), inverse_transform(out.output, scaler_std, scaler_mean)

    return step


def _weighted_eval(eval_step, params, loader) -> Dict:
    """Sample-weighted loss means + vstacked predictions
    (traintest_MegaCRNx.py:92-111)."""
    sums = np.zeros(4)
    n = 0
    preds = []
    for x, y, yc in loader:
        (vals, y_pred) = eval_step(params, x, y, yc)
        b = x.shape[0]
        sums += np.array(jax.device_get(vals)) * b
        n += b
        preds.append(np.asarray(y_pred))
    loss, l1, l2, l3 = (sums / n).tolist()
    return {"loss": loss, "loss1": l1, "loss2": l2, "loss3": l3,
            "preds": np.vstack(preds)}


class _XYCovLoader:
    """Sequential 3-tensor batches with the torch drop_last=False tail."""

    def __init__(self, x, y, ycov, batch_size):
        self._inner = BatchLoader(x, y, batch_size,
                                  pad_with_last_sample=False, keep_tail=True)
        self.ycov = ycov

    def __len__(self):
        return len(self._inner)

    def __iter__(self):
        bs = self._inner.batch_size
        for i, (x, y) in enumerate(self._inner):
            yield x, y, self.ycov[i * bs:i * bs + len(x)]


def fit_megacrnx(
    model_cfg: megacrnx.MegaCRNxConfig,
    train_cfg: MegaCRNxTrainConfig,
    data: Dict,
    run: RunDir,
    *,
    max_epochs: Optional[int] = None,
    initial_params=None,
    mesh=None,
) -> Dict:
    """Train MegaCRNx with the model_futurework protocol.

    ``data`` keys: ``x_trainval`` (SCALED), ``y_trainval`` (raw),
    ``ycov_trainval``, ``x_test``/``y_test``/``ycov_test`` likewise, and
    scalar ``scaler_mean``/``scaler_std``. Windowing per
    ``megacrn_tpu.data.windowing.ratio_windows``.

    ``mesh``: optional jax.sharding.Mesh — full-size batches train
    data-parallel through the explicit shard_map step
    (``parallel.api.make_megacrnx_mesh_train_step``); the protocol's
    drop_last=False tail batch (whose size need not divide the data axis)
    falls back to the single-device step — identical math either way, so
    the trajectory is unchanged. Eval runs single-device as in ``fit_gts``.
    Returns {params (best), best_val, test_metrics, epochs_run}.
    """
    logger = run.get_logger()
    echo_hparams(logger, model=model_cfg, train=train_cfg)

    key = jax.random.PRNGKey(train_cfg.seed)
    k_init, k_reinit = jax.random.split(key)
    params = megacrnx.init_params(k_init, model_cfg)
    # getModel applies xavier_uniform (dim>1) / U(0,1) (dim==1) over the
    # fresh module (traintest_MegaCRNx.py:75-79) — same second-init pass as
    # the EXPY-TKY harness.
    from megacrn_tpu.train.loop import _reinit_xavier_uniform
    params = _reinit_xavier_uniform(params, k_reinit)
    if initial_params is not None:
        # Injected start point (e.g. converted from the reference torch
        # state_dict for train-to-train parity, tools/parity_train_megacrnx).
        params = jax.tree_util.tree_map(jnp.asarray, initial_params)

    optimizer = optax.adam(train_cfg.lr)  # plain Adam, torch defaults (:126)
    opt_state = optimizer.init(params)
    mean, std = float(data["scaler_mean"]), float(data["scaler_std"])

    x_tv, y_tv = data["x_trainval"], data["y_trainval"]
    yc_tv = data["ycov_trainval"]
    train_size = int(len(x_tv) * (1 - train_cfg.val_ratio))
    train_iter = _XYCovLoader(x_tv[:train_size], y_tv[:train_size],
                              yc_tv[:train_size], train_cfg.batch_size)
    val_iter = _XYCovLoader(x_tv[train_size:], y_tv[train_size:],
                            yc_tv[train_size:], train_cfg.batch_size)
    trainval_iter = _XYCovLoader(x_tv, y_tv, yc_tv, train_cfg.batch_size)
    test_iter = _XYCovLoader(data["x_test"], data["y_test"],
                             data["ycov_test"], train_cfg.batch_size)

    train_step = make_megacrnx_train_step(model_cfg, train_cfg, optimizer,
                                          mean, std)
    mesh_step, mesh_data_ax = None, 1
    if mesh is not None:
        from megacrn_tpu.parallel.api import make_megacrnx_mesh_train_step
        from megacrn_tpu.parallel.mesh import DATA_AXIS

        mesh_step = make_megacrnx_mesh_train_step(
            model_cfg, train_cfg, optimizer, mesh, mean, std)
        mesh_data_ax = mesh.shape[DATA_AXIS]
    eval_step = make_megacrnx_eval_step(model_cfg, train_cfg, mean, std)

    min_val_loss = float("inf")
    wait = 0
    epochs = max_epochs if max_epochs is not None else train_cfg.epochs
    epochs_run = 0
    for epoch in range(epochs):
        t0 = time.time()
        sums = np.zeros(4)
        n = 0
        step_i = 0
        for x, y, yc in train_iter:
            use_mesh = mesh_step is not None and x.shape[0] % mesh_data_ax == 0
            active_step = mesh_step if use_mesh else train_step
            params, opt_state, vals = active_step(params, opt_state, x, y, yc)
            sums += np.array(jax.device_get(vals)) * x.shape[0]
            n += x.shape[0]
            step_i += 1
            if step_i % 10 == 0:
                float(vals[0])  # bound the async queue (axon tunnel)
        train_loss = sums / n
        val = _weighted_eval(eval_step, params, val_iter)
        dt = time.time() - t0
        msg = (f"epoch {epoch} time used: {dt:.1f}s train loss: "
               f"{train_loss[0]:.6f} {train_loss[1]:.6f} "
               f"{train_loss[2]:.6f} {train_loss[3]:.6f} validation loss: "
               f"{val['loss']:.6f} {val['loss1']:.6f} "
               f"{val['loss2']:.6f} {val['loss3']:.6f}")
        logger.info(msg)
        run.append_epochlog(msg)
        run.log_metrics({"epoch": epoch, "train_loss": train_loss[0],
                         "val_loss": val["loss"], "seconds": dt})
        epochs_run = epoch + 1
        if val["loss"] < min_val_loss:
            wait = 0
            min_val_loss = val["loss"]
            ckpt.save_checkpoint(run.checkpoint_path, params,
                                 metadata={"epoch": epoch,
                                           "best_val": min_val_loss})
        else:
            wait += 1
            if wait == train_cfg.patience:
                logger.info("Early stopping at epoch:", epoch)
                break

    # trainval eval with the CURRENT (last-epoch) params — the reference
    # logs this before reloading best (traintest_MegaCRNx.py:178-184).
    tv = _weighted_eval(eval_step, params, trainval_iter)
    m = metrics.evaluate(np.squeeze(y_tv), np.squeeze(tv["preds"]))
    logger.info("trainval loss, MSE, RMSE, MAE, MAPE:",
                f"{tv['loss']:.6f}", *[f"{v:.6f}" for v in m])

    # testModel: fresh best params, numpy metrics all-steps + per-step
    # (traintest_MegaCRNx.py:186-207).
    params, _, _ = ckpt.load_checkpoint(run.checkpoint_path, params)
    te = _weighted_eval(eval_step, params, test_iter)
    y_true = np.squeeze(data["y_test"])
    y_pred = np.squeeze(te["preds"])
    mse_, rmse_, mae_, mape_ = metrics.evaluate(y_true, y_pred)
    line = (f"all pred steps, MSE, RMSE, MAE, MAPE, {mse_:.6f}, "
            f"{rmse_:.6f}, {mae_:.6f}, {mape_:.6f}")
    logger.info(line)
    run.append_scores(line)
    per_step = []
    for i in range(model_cfg.horizon):  # reference's opt.seq_len = horizon
        step_m = metrics.evaluate(y_true[:, i], y_pred[:, i])
        per_step.append(step_m)
        line = (f"{i + 1} step, MSE, RMSE, MAE, MAPE, "
                + ", ".join(f"{v:.6f}" for v in step_m))
        run.append_scores(line)
    test_metrics = {"mse": mse_, "rmse": rmse_, "mae": mae_, "mape": mape_,
                    "per_step": per_step, "loss": te["loss"]}
    run.log_metrics({"final_test": {k: v for k, v in test_metrics.items()
                                    if k != "per_step"},
                     "best_val": min_val_loss})
    return {"params": params, "best_val": min_val_loss,
            "test_metrics": test_metrics, "epochs_run": epochs_run}
