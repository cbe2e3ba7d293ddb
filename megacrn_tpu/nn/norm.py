"""BatchNorm1d with running statistics, torch-parity semantics.

Needed by the GTS graph learner (``model/GTS.py:354-356``). Functional: the
mutable running stats live in an explicit state pytree threaded through
``apply``. Matches torch defaults: eps=1e-5, momentum=0.1 (running = (1-m) *
running + m * batch), batch stats in training mode (biased variance for
normalisation, unbiased for the running update — torch quirk), running stats
in eval.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def bn_init(num_features: int, dtype=jnp.float32) -> Tuple[Dict, Dict]:
    params = {"scale": jnp.ones((num_features,), dtype),
              "bias": jnp.zeros((num_features,), dtype)}
    state = {"mean": jnp.zeros((num_features,), dtype),
             "var": jnp.ones((num_features,), dtype)}
    return params, state


def bn_apply(params: Dict, state: Dict, x: jnp.ndarray, training: bool,
             momentum: float = 0.1, eps: float = 1e-5
             ) -> Tuple[jnp.ndarray, Dict]:
    """x: (B, C) or (B, C, L); normalised per channel C."""
    axes = (0,) if x.ndim == 2 else (0, 2)
    if training:
        mean = x.mean(axes)
        var = x.var(axes)  # biased, used for normalisation
        n = x.shape[0] * (x.shape[2] if x.ndim == 3 else 1)
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    shape = (1, -1) + ((1,) if x.ndim == 3 else ())
    y = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    y = y * params["scale"].reshape(shape) + params["bias"].reshape(shape)
    return y, new_state
