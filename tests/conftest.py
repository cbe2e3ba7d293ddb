"""Test harness setup: force an 8-device virtual CPU mesh.

Tests never touch the real TPU chip — sharding logic is validated on
``xla_force_host_platform_device_count=8`` CPU devices, per the multi-host
test strategy in SURVEY.md section 4. The ``jax.config.update`` call is
required in addition to the env var because the axon TPU plugin otherwise
claims the platform even when ``JAX_PLATFORMS=cpu`` is set.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float32 matmuls on CPU default to fast (low-precision-equivalent) paths in
# some configs; pin highest so golden-parity tolerances are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")
