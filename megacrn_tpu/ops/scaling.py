"""Jit-safe inverse standardisation for losses and metrics.

Every reference harness computes its masked metrics on the inverse-transformed
scale with ``mask = (y_true != 0)`` marking missing sensor readings
(``model/utils.py:57-96``, ``model/traintest_MegaCRN.py:60-86``). That
contract only works because the normalise/denormalise round trip
``((0 - mean)/std) * std + mean`` lands back on EXACTLY ``0.0`` under
separately-rounded f32 multiply and add — which is what torch and numpy
execute: ``fl(y*std)`` rounds to ``-mean`` whenever the exact product is
within half an ulp of it, and the add then cancels exactly. Under ``jax.jit``
the multiply and add are contracted into a single fma (LLVM/Mosaic codegen
contracts inside fused computations, so even an ``optimization_barrier``
between them does not survive), whose once-rounded result is a tiny NONZERO
residual (~1e-6 for METR-LA-scale stats). The missing-data mask then silently
stops matching: MAPE divides by ~1e-6 "speeds" and MAE/MSE include sentinel
entries the reference masks out.

``inverse_transform`` therefore reproduces the two-rounding semantics
explicitly: any result within half an ulp of ``mean`` from zero — exactly the
window torch's separate rounding collapses to ``0.0`` — is snapped to zero.
All on-device loss/metric code must denormalise through it, never with a bare
``y * std + mean``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_transform(x, std, mean):
    """``x * std + mean`` with the reference's two-rounding zero snapping.

    ``std``/``mean`` may be scalars, numpy arrays, or traced values.
    """
    y = x * std + mean
    # Half-ulp(mean): the residual window where fl32(x*std) == -mean, which
    # collapses to exact 0.0 under separately-rounded mul/add (torch, numpy,
    # eager jax).
    m32 = jnp.abs(jnp.asarray(mean, dtype=jnp.float32))
    tol = 0.5 * (jnp.nextafter(m32, jnp.inf) - m32)
    return jnp.where(jnp.abs(y) <= tol, jnp.zeros_like(y), y)
