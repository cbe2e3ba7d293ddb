"""GTS training harness: the reference ``model/traintest_GTS.py`` protocol.

Objective: ``masked_mae(inv(pred), inv(true)) + BCE(adj_prob, knn_prior)``
(``traintest_GTS.py:144-164``); Adam(base_lr=0.005, eps=1e-3), grad clip 5,
constant LR (the MultiStepLR is commented out in the reference, :139),
val-loss early stop with best-checkpoint reload. The eval-side BCE applies a
(redundant) sigmoid on the probabilities — a reference quirk kept for loss
parity (:119-123).
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from megacrn_tpu.config import GTSConfig, TrainConfig
from megacrn_tpu.models import gts
from megacrn_tpu.ops import losses
from megacrn_tpu.train import checkpoint as ckpt
from megacrn_tpu.train.logs import RunDir, echo_hparams
from megacrn_tpu.ops.scaling import inverse_transform


def bce(pred_probs: jnp.ndarray, targets: jnp.ndarray,
        eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.BCELoss parity (probabilities in, mean reduction; torch clamps
    log terms at -100, irrelevant for eps-clipped inputs)."""
    p = jnp.clip(pred_probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log1p(-p))


def _prepare(x: np.ndarray, y: np.ndarray, cfg: GTSConfig):
    """traintest_GTS.py:81-103: the full input channel stack enters the
    encoder; targets keep output_dim channels."""
    x0 = np.ascontiguousarray(x[..., : cfg.input_dim], np.float32)
    y0 = np.ascontiguousarray(y[..., : cfg.output_dim], np.float32)
    return x0, y0


def make_gts_train_step(cfg: GTSConfig, train_cfg: TrainConfig,
                        optimizer, scaler_mean, scaler_std, node_feas,
                        knn_prior, gumbel_noise: bool = True):
    node_feas = jnp.asarray(node_feas)
    knn_prior = jnp.asarray(knn_prior).reshape(-1)

    def loss_fn(params, bn_state, x, y, batches_seen, rng):
        out = gts.forward(params, bn_state, x, node_feas, cfg, labels=y,
                          batches_seen=batches_seen, rng=rng, training=True,
                          gumbel_noise=gumbel_noise)
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        y_true = inverse_transform(y, scaler_std, scaler_mean)
        pred_loss = losses.masked_mae_loss(y_pred, y_true)
        graph_loss = bce(out.adj_prob.reshape(-1), knn_prior)
        return pred_loss + graph_loss, out.bn_state

    @jax.jit
    def step(params, bn_state, opt_state, x, y, batches_seen, rng):
        # Per-step key folded in on-device (host split per step serializes
        # tunnel round trips — see train/loop.py).
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        (loss, bn_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn_state, x, y, batches_seen, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bn_state, opt_state, loss

    return step


def make_gts_eval_step(cfg: GTSConfig, scaler_mean, scaler_std, node_feas,
                       knn_prior, gumbel_noise: bool = True):
    node_feas = jnp.asarray(node_feas)
    knn_prior = jnp.asarray(knn_prior).reshape(-1)

    @jax.jit
    def eval_step(params, bn_state, x, y, rng):
        out = gts.forward(params, bn_state, x, node_feas, cfg,
                          rng=rng, training=False,
                          gumbel_noise=gumbel_noise)
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        y_true = inverse_transform(y, scaler_std, scaler_mean)
        pred_loss = losses.masked_mae_loss(y_pred, y_true)
        # Eval-side quirk: sigmoid over the softmax probs (traintest_GTS:119).
        graph_loss = bce(jax.nn.sigmoid(out.adj_prob.reshape(-1)), knn_prior)
        m = {"loss": pred_loss + graph_loss,
             "mae": pred_loss,
             "mape": losses.masked_mape_loss(y_pred, y_true),
             "mse": losses.masked_mse_loss(y_pred, y_true)}
        for s in (3, 6, 12):
            if s <= cfg.horizon:
                m[f"mae_{s}"] = losses.masked_mae_loss(
                    y_pred[:, s - 1:s], y_true[:, s - 1:s])
                m[f"mape_{s}"] = losses.masked_mape_loss(
                    y_pred[:, s - 1:s], y_true[:, s - 1:s])
                m[f"mse_{s}"] = losses.masked_mse_loss(
                    y_pred[:, s - 1:s], y_true[:, s - 1:s])
        return m

    return eval_step


def fit_gts(cfg: GTSConfig, train_cfg: TrainConfig, data: Dict,
            node_feas: np.ndarray, knn_prior: np.ndarray, run: RunDir,
            max_epochs=None, mesh=None, initial_state=None,
            gumbel_noise: bool = True) -> Dict:
    """data: train/val/test BatchLoaders + scaler_mean/std (as in
    megacrn_tpu.train.loop.fit). ``mesh``: optional jax.sharding.Mesh —
    trains data-parallel through the explicit shard_map step
    (megacrn_tpu.parallel.api.make_gts_mesh_train_step)."""
    from megacrn_tpu.train.steps import summarize_eval

    logger = run.get_logger()
    echo_hparams(logger, model=cfg, train=train_cfg)
    seed = train_cfg.seed if train_cfg.seed is not None else int(time.time())
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params, bn_state = gts.init_params(k_init, cfg)
    if initial_state is not None:
        # (params, bn_state) injected — e.g. converted from the reference
        # torch state_dict (interop.gts_params_from_torch_state_dict) for
        # train-to-train parity runs.
        params, bn_state = jax.tree_util.tree_map(jnp.asarray,
                                                  initial_state)

    opt_parts = []
    if train_cfg.max_grad_norm is not None:
        # torch clip_grad_norm_ bit semantics (traintest_GTS.py:163) — see
        # megacrn_tpu.train.optim.clip_by_global_norm_torch.
        from megacrn_tpu.train.optim import clip_by_global_norm_torch

        opt_parts.append(clip_by_global_norm_torch(train_cfg.max_grad_norm))
    opt_parts.append(optax.adam(train_cfg.lr, eps=train_cfg.epsilon))
    optimizer = optax.chain(*opt_parts)
    opt_state = optimizer.init(params)

    mean, std = data.get("scaler_mean", 0.0), data.get("scaler_std", 1.0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from megacrn_tpu.parallel.api import make_gts_mesh_train_step
        from megacrn_tpu.parallel.mesh import DATA_AXIS

        train_step = make_gts_mesh_train_step(
            cfg, train_cfg, optimizer, mesh, mean, std, node_feas, knn_prior,
            gumbel_noise=gumbel_noise)
        dp = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        place = lambda a: jax.device_put(a, dp)
    else:
        train_step = make_gts_train_step(cfg, train_cfg, optimizer, mean,
                                         std, node_feas, knn_prior,
                                         gumbel_noise=gumbel_noise)
        place = lambda a: a
    eval_step = make_gts_eval_step(cfg, mean, std, node_feas, knn_prior,
                                   gumbel_noise=gumbel_noise)

    def evaluate(loader):
        ms = []
        k0 = jax.random.PRNGKey(0)
        for x, y in loader:
            x0, y0 = _prepare(x, y, cfg)
            ms.append(jax.device_get(eval_step(params, bn_state, x0, y0, k0)))
        return summarize_eval(ms, cfg.horizon)

    batches_seen, min_val, wait = 0, float("inf"), 0
    epochs = max_epochs if max_epochs is not None else train_cfg.epochs
    for epoch in range(epochs):
        t0 = time.time()
        tl = []
        key, k_epoch = jax.random.split(key)
        for x, y in data["train_loader"]:
            x0, y0 = _prepare(x, y, cfg)
            params, bn_state, opt_state, loss = train_step(
                params, bn_state, opt_state, place(x0), place(y0),
                jnp.float32(batches_seen), k_epoch)
            tl.append(loss)
            batches_seen += 1
            if batches_seen % 10 == 0:
                float(loss)  # bound the tunnel dispatch queue
        val = evaluate(data["val_loader"])
        msg = (f"Epoch [{epoch + 1}/{epochs}] ({batches_seen}) "
               f"train_loss: {float(np.mean([float(l) for l in tl])):.4f}, "
               f"val_loss: {val['loss']:.4f}, {time.time() - t0:.1f}s")
        logger.info(msg)
        run.append_epochlog(msg)
        run.log_metrics({"epoch": epoch + 1,
                         "train_loss": float(np.mean([float(l)
                                                      for l in tl])),
                         "val": val, "seconds": time.time() - t0})
        if val["loss"] < min_val:
            wait, min_val = 0, val["loss"]
            ckpt.save_checkpoint(run.checkpoint_path, params,
                                 metadata={"epoch": epoch,
                                           "bn_state": None})
            ckpt.save_checkpoint(run.checkpoint_path + ".bn", bn_state)
        else:
            wait += 1
            if wait == train_cfg.patience:
                logger.info("Early stopping at epoch:", epoch)
                break

    params, _, _ = ckpt.load_checkpoint(run.checkpoint_path, params)
    bn_state, _, _ = ckpt.load_checkpoint(run.checkpoint_path + ".bn", bn_state)
    test = evaluate(data["test_loader"])
    logger.info("GTS best-model test: mae:", f"{test['mae']:.4f}",
                "rmse:", f"{test['rmse']:.4f}")
    run.log_metrics({"final_test": test, "best_val": min_val})
    return {"params": params, "bn_state": bn_state, "test_metrics": test,
            "best_val": min_val}
