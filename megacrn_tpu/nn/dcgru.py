"""DCGRU cell: diffusion-convolution GRU (the GTS baseline recurrent unit).

Functional rebuild of ``model/GTS.py:69-217`` on the natural (B, N, C) layout
(the reference flattens to (B, N*C) — a torch-module artifact with no
mathematical content). Parity-critical details preserved:

* Per-step random-walk support ``(D^-1 (A + I))^T`` (``GTS.py:118-126,136``)
  rebuilt from the sampled adjacency every cell step.
* Diffusion stack ``[x, A x, 2 A x1 - x0, ...]`` with K+1 matrices including
  the identity once (``GTS.py:185-206``).
* Feature ordering for the projection is **input-major, matrix-minor**
  (flat index = c * num_matrices + k — from the (B, N, input_size, order)
  permute at ``GTS.py:208-209``), the opposite of MegaCRN's support-major
  layout; weight-port compatibility depends on it.
* Gate projection bias_start = 1.0 (``GTS.py:142``), candidate bias 0;
  ``r`` (first split half) gates the state into the candidate, ``u`` is the
  convex-combination gate (``GTS.py:144-153``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from megacrn_tpu.nn.init import xavier_normal


def random_walk_support(adj: jnp.ndarray) -> jnp.ndarray:
    """(D^-1 (A + I))^T with inf->0 on empty rows (GTS.py:118-126) followed by
    the transpose taken at the call site (GTS.py:136)."""
    a = adj + jnp.eye(adj.shape[0], dtype=adj.dtype)
    d = a.sum(axis=1)
    d_inv = jnp.where(d > 0, 1.0 / d, 0.0)
    return (d_inv[:, None] * a).T


def diffusion_stack(support: jnp.ndarray, x: jnp.ndarray, max_step: int
                    ) -> jnp.ndarray:
    """[T_0..T_K](A) applied to x: (B, N, C) -> (B, N, C, K+1), feature-major
    ordering (see module docstring)."""
    terms = [x]
    if max_step > 0:
        x0, x1 = x, jnp.einsum("nm,bmc->bnc", support, x,
                               preferred_element_type=x.dtype)
        terms.append(x1)
        for _ in range(2, max_step + 1):
            x2 = 2.0 * jnp.einsum("nm,bmc->bnc", support, x1,
                                  preferred_element_type=x.dtype) - x0
            terms.append(x2)
            x0, x1 = x1, x2
    return jnp.stack(terms, axis=-1)  # (B, N, C, K+1)


def dcgru_cell_init(key, dim_in: int, num_units: int, max_diffusion_step: int,
                    dtype=jnp.float32) -> Dict:
    num_matrices = max_diffusion_step + 1
    input_size = dim_in + num_units
    kg, kc = jax.random.split(key)
    return {
        "gate": {
            "W": xavier_normal(kg, (input_size * num_matrices, 2 * num_units), dtype),
            "b": jnp.full((2 * num_units,), 1.0, dtype),  # bias_start=1.0
        },
        "candidate": {
            "W": xavier_normal(kc, (input_size * num_matrices, num_units), dtype),
            "b": jnp.zeros((num_units,), dtype),
        },
    }


def _gconv(p: Dict, support: jnp.ndarray, x: jnp.ndarray, h: jnp.ndarray,
           max_step: int) -> jnp.ndarray:
    xs = jnp.concatenate([x, h], axis=-1)  # (B, N, C)
    stack = diffusion_stack(support, xs, max_step)  # (B, N, C, K+1)
    b, n, c, k = stack.shape
    flat = stack.reshape(b, n, c * k)  # input-major, matrix-minor
    return flat @ p["W"] + p["b"]


def dcgru_cell_apply(params: Dict, x: jnp.ndarray, h: jnp.ndarray,
                     adj: jnp.ndarray, max_diffusion_step: int,
                     activation=jnp.tanh) -> jnp.ndarray:
    """One DCGRU step (GTS.py:128-153). x: (B, N, dim_in); h: (B, N, units)."""
    # Degree normalisation in the adj's own (f32) precision; the support
    # then narrows to the compute dtype so bf16-mode diffusion matmuls
    # don't silently promote back to f32.
    support = random_walk_support(adj).astype(x.dtype)
    ru = jax.nn.sigmoid(_gconv(params["gate"], support, x, h,
                               max_diffusion_step))
    r, u = jnp.split(ru, 2, axis=-1)
    c = _gconv(params["candidate"], support, x, r * h, max_diffusion_step)
    if activation is not None:
        c = activation(c)
    return u * h + (1.0 - u) * c
