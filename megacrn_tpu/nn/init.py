"""Parameter initializers with torch-parity distributions.

The reference initialisation scheme determines the trained accuracy, so each
distribution is replicated:

* ``xavier_normal_`` on 2-D weights (AGCN weights ``model/MegaCRN.py:13``,
  memory bank params ``model/MegaCRN.py:155-156``): N(0, gain^2 * 2/(fan_in+fan_out)).
* zero bias (``model/MegaCRN.py:14``).
* torch ``nn.Linear`` default for the projection head
  (``model/MegaCRN.py:144``): weight ~ kaiming_uniform(a=sqrt(5)) which
  reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias the same bound.
* EXPY-TKY harness second-pass init (``model_EXPYTKY/traintest_MegaCRN.py:27-35``):
  xavier_uniform on dim>1 params, U(0,1) on 1-D params.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_normal(key, shape, dtype=jnp.float32, gain: float = 1.0):
    fan_in, fan_out = shape[0], shape[1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32, gain: float = 1.0):
    fan_in, fan_out = shape[0], shape[1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """shape = (fan_in, fan_out); stored input-major so apply is ``x @ W``."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(key, fan_in, shape, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
