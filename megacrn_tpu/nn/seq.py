"""Stacked-cell sequence modules: scanned encoder and single-step decoder.

The reference encoder loops layer-outer / time-inner in Python
(``model/MegaCRN.py:65-83``); for a stacked RNN that is mathematically
identical to time-outer / layer-inner, which is the XLA-friendly form — one
``lax.scan`` over time whose body runs the (small, static) layer stack. The
whole recurrence compiles to a single fused loop instead of T*L dispatches.

The decoder cell stack runs one step over layers (``model/MegaCRN.py:103-113``)
and is scanned over the horizon by the model (``megacrn_tpu.models.megacrn``).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from megacrn_tpu.nn.cell import gcrn_cell_apply, gcrn_cell_init
from megacrn_tpu.ops.graph import cheb_aggregate


def encoder_init(key, dim_in: int, dim_out: int, cheb_k: int,
                 num_layers: int, num_supports: int = 2,
                 dtype=jnp.float32) -> List[Dict]:
    """Layer 0 maps dim_in->dim_out; deeper layers dim_out->dim_out
    (model/MegaCRN.py:60-63)."""
    keys = jax.random.split(key, num_layers)
    layers = [gcrn_cell_init(keys[0], dim_in, dim_out, cheb_k, num_supports, dtype)]
    for i in range(1, num_layers):
        layers.append(
            gcrn_cell_init(keys[i], dim_out, dim_out, cheb_k, num_supports, dtype))
    return layers


decoder_init = encoder_init  # same structure (model/MegaCRN.py:91-101)


def stack_step(layer_params: List[Dict], x_t: jnp.ndarray,
               states: Tuple[jnp.ndarray, ...], supports,
               cheb_k: int, aggregate=cheb_aggregate
               ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """One time step through the layer stack; layer i consumes layer i-1's
    fresh output (model/MegaCRN.py:107-112). Returns (top output, new states)."""
    inp = x_t
    new_states = []
    for p, h in zip(layer_params, states):
        h_new = gcrn_cell_apply(p, inp, h, supports, cheb_k, aggregate)
        new_states.append(h_new)
        inp = h_new
    return inp, tuple(new_states)


def encoder_apply(layer_params: List[Dict], x_seq: jnp.ndarray,
                  init_states: Tuple[jnp.ndarray, ...],
                  supports: jnp.ndarray, cheb_k: int
                  ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Run the stack over the full sequence (model/MegaCRN.py:65-83).

    x_seq: (B, T, N, C). Returns (outputs (B, T, N, H), final states per layer).
    """
    x_tm = jnp.swapaxes(x_seq, 0, 1)  # (T, B, N, C) — scan over leading axis

    def step(states, x_t):
        out, new_states = stack_step(layer_params, x_t, states, supports, cheb_k)
        return new_states, out

    final_states, outs = jax.lax.scan(step, tuple(init_states), x_tm)
    return jnp.swapaxes(outs, 0, 1), final_states


def init_hidden(num_layers: int, batch: int, num_nodes: int, hidden: int,
                dtype=jnp.float32) -> Tuple[jnp.ndarray, ...]:
    """Zero states per layer (model/MegaCRN.py:50-51, 85-89)."""
    return tuple(
        jnp.zeros((batch, num_nodes, hidden), dtype) for _ in range(num_layers))
