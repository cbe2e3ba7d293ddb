"""Debug mode: NaN/Inf detection inside the jitted training step.

The reference's only numerical guard is the NaN-zeroing trick in its losses;
here ``checkify`` instruments the whole step (jit-purity preserved — errors
come back as values, SURVEY.md section 5 "race detection / sanitizers").
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
from jax.experimental import checkify


def checkified(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable function so NaN/Inf produced anywhere inside raises a
    JaxRuntimeError on the host after the step returns.

    Usage::

        safe_step = checkified(train_step)
        params, opt_state, loss = safe_step(...)  # throws on NaN/Inf
    """
    checked = checkify.checkify(fn, errors=errors)
    jitted = jax.jit(checked)

    def wrapper(*args, **kwargs):
        err, out = jitted(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def grad_global_norm(grads) -> jax.Array:
    """Global L2 norm of a gradient pytree (telemetry / divergence alarms)."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def finite_tree(tree) -> Tuple[bool, list]:
    """Host-side check: returns (all_finite, offending_paths)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not np.all(np.isfinite(np.asarray(leaf))):
            bad.append("/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path))
    return len(bad) == 0, bad
