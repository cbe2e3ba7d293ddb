"""Optimizer with exact reference-protocol semantics via optax.

Reference: Adam(lr, eps=1e-3) + MultiStepLR(milestones, gamma) stepped per
epoch + clip_grad_norm_(max_grad_norm) before the step
(``model/traintest_MegaCRN.py:104-105,129-130``). torch Adam's update is
``m_hat / (sqrt(v_hat) + eps)`` which is optax's ``scale_by_adam`` with
``eps_root=0`` — i.e. plain ``optax.adam``. MultiStepLR at epoch granularity
maps to a piecewise-constant schedule over optimizer steps given a fixed
steps_per_epoch.
"""
from __future__ import annotations

import optax

from megacrn_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    boundaries = {
        int(m) * steps_per_epoch: cfg.lr_decay_ratio for m in cfg.lr_milestones
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    parts = []
    if cfg.max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts.append(
        optax.adam(lr_schedule(cfg, steps_per_epoch), eps=cfg.epsilon))
    return optax.chain(*parts)
