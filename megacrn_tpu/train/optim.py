"""Optimizer with exact reference-protocol semantics via optax.

Reference: Adam(lr, eps=1e-3) + MultiStepLR(milestones, gamma) stepped per
epoch + clip_grad_norm_(max_grad_norm) before the step
(``model/traintest_MegaCRN.py:104-105,129-130``). torch Adam's update is
``m_hat / (sqrt(v_hat) + eps)`` which is optax's ``scale_by_adam`` with
``eps_root=0`` — i.e. plain ``optax.adam``. MultiStepLR at epoch granularity
maps to a piecewise-constant schedule over optimizer steps given a fixed
steps_per_epoch. Clipping reproduces torch's ``clip_grad_norm_`` bit
semantics (the ``max_norm / (norm + 1e-6)`` coefficient, clamped at 1 and
applied unconditionally), not optax's epsilon-free branch — the +1e-6 was
the last measurable drift source in the float64 parity-control runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from megacrn_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    boundaries = {
        int(m) * steps_per_epoch: cfg.lr_decay_ratio for m in cfg.lr_milestones
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ parity: scale every grad by
    ``min(max_norm / (global_norm + 1e-6), 1.0)`` — torch adds 1e-6 to the
    denominator and multiplies by the (exactly 1.0 when not clipping)
    clamped coefficient. optax's ``clip_by_global_norm`` divides by the bare
    norm, a ~``1e-6/norm`` relative difference per clipped step that
    dominates the float64 parity budget."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (g_norm + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda t: t * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    parts = []
    if cfg.max_grad_norm is not None:
        parts.append(clip_by_global_norm_torch(cfg.max_grad_norm))
    parts.append(
        optax.adam(lr_schedule(cfg, steps_per_epoch), eps=cfg.epsilon))
    return optax.chain(*parts)
