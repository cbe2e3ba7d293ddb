"""Sharded training/eval steps over a device mesh.

Same math as ``megacrn_tpu.train.steps``; the jitted step picks up GSPMD
shardings from its committed inputs (place params with ``shard_params``,
batches with ``shard_batch``; ``optimizer.init`` on sharded params yields
matching-sharded moments) and pins the internal node-partitioned layout with
``with_sharding_constraint`` hooks so XLA inserts the boundary all-gathers
over the ``node`` axis and psums gradients over ``data``. Multi-host entry is
``jax.distributed.initialize`` by the caller; everything here only assumes a
``Mesh``.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from megacrn_tpu.config import MegaCRNConfig, TrainConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.parallel.mesh import make_shard_fn
from megacrn_tpu.train.steps import composite_loss


def make_sharded_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    donate: bool = True,
) -> Callable:
    """Jitted ``(params, opt_state, x, y, y_cov, batches_seen, rng) ->
    (params, opt_state, loss)``. Inputs must be placed on the mesh
    (``shard_params`` / ``shard_batch``); params and opt_state buffers are
    donated so the update is in-place in HBM."""
    shard_fn = make_shard_fn(mesh)

    def loss_fn(params, x, y, y_cov, batches_seen, rng):
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True, shard_fn=shard_fn)
        return composite_loss(out, y, train_cfg, scaler_mean, scaler_std)

    def step(params, opt_state, x, y, y_cov, batches_seen, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, y_cov, batches_seen, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_sharded_eval_forward(model_cfg: MegaCRNConfig, mesh: Mesh) -> Callable:
    shard_fn = make_shard_fn(mesh)

    @jax.jit
    def fwd(params, x, y_cov):
        return megacrn.forward(params, x, y_cov, model_cfg, shard_fn=shard_fn)

    return fwd
