"""AGCN graph convolution and the graph-conv GRU cell (GCRN cell).

Functional re-design of the reference modules (``model/MegaCRN.py:7-51``):
parameters are plain pytrees, application is pure. Two TPU-oriented departures
from the reference structure (math is identical):

* The Chebyshev stack is applied to features, never materialised as N x N
  (see ``megacrn_tpu.ops.graph.cheb_aggregate``).
* The cell shares the aggregation of ``x`` between the gate and candidate
  AGCNs. The reference aggregates ``[x||h]`` for the gate and ``[x||z*h]``
  for the candidate — 4 half-aggregations; since aggregation is linear and
  blockwise over the concat, ``agg([a||b]) == [agg(a)||agg(b)]``, so we
  aggregate ``x`` once and reuse it (3 aggregations per step). The flattened
  feature order (support-major, then [x-block, h-block]) matches the
  reference weight layout ``(2*cheb_k*(dim_in+hidden), out)`` exactly.

Gate-role parity note (``model/MegaCRN.py:43-47``): the *first* half ``z`` of
the sigmoid output gates the state fed to the candidate, the *second* half
``r`` is the convex-combination gate: ``h = r*h + (1-r)*hc``. This is
deliberately preserved (it is not the textbook GRU assignment).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from megacrn_tpu.nn.init import xavier_normal
from megacrn_tpu.ops.graph import cheb_aggregate


def agcn_init(key, dim_in: int, dim_out: int, cheb_k: int, num_supports: int = 2,
              dtype=jnp.float32) -> Dict:
    """AGCN params: weight (S*K*dim_in, dim_out) xavier-normal, zero bias
    (model/MegaCRN.py:11-14)."""
    w = xavier_normal(key, (num_supports * cheb_k * dim_in, dim_out), dtype)
    b = jnp.zeros((dim_out,), dtype)
    return {"W": w, "b": b}


def agcn_apply(params: Dict, x: jnp.ndarray, supports: jnp.ndarray,
               cheb_k: int) -> jnp.ndarray:
    """Standalone AGCN (model/MegaCRN.py:16-28): aggregate then project."""
    agg = cheb_aggregate(supports, x, cheb_k)  # (B, N, S*K, C)
    b, n, sk, c = agg.shape
    x_g = agg.reshape(b, n, sk * c)
    return x_g @ params["W"] + params["b"]


def gcrn_cell_init(key, dim_in: int, dim_out: int, cheb_k: int,
                   num_supports: int = 2, dtype=jnp.float32) -> Dict:
    """Gate AGCN -> 2*dim_out, update AGCN -> dim_out (model/MegaCRN.py:35-36)."""
    kg, ku = jax.random.split(key)
    return {
        "gate": agcn_init(kg, dim_in + dim_out, 2 * dim_out, cheb_k,
                          num_supports, dtype),
        "update": agcn_init(ku, dim_in + dim_out, dim_out, cheb_k,
                            num_supports, dtype),
    }


def _project(agg_x: jnp.ndarray, agg_h: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Project the concat [agg_x || agg_h] with a weight laid out for the
    reference feature order: support-major blocks of width (dim_in+hidden),
    each block = [x-features, h-features]."""
    b, n, sk, cx = agg_x.shape
    ch = agg_h.shape[-1]
    cat = jnp.concatenate([agg_x, agg_h], axis=-1)  # (B,N,SK,Cx+Ch)
    return cat.reshape(b, n, sk * (cx + ch)) @ p["W"] + p["b"]


def gcrn_cell_apply(params: Dict, x: jnp.ndarray, h: jnp.ndarray,
                    supports, cheb_k: int,
                    aggregate=cheb_aggregate) -> jnp.ndarray:
    """One GCRN step (model/MegaCRN.py:38-48).

    x: (B, N, dim_in); h: (B, N, hidden). Returns new hidden (B, N, hidden).

    Aggregation is linear and blockwise over the feature concat, so the gate
    aggregates ``[x || h]`` in ONE fat stack and the candidate reuses its
    x-slice — 2 Chebyshev stacks per step instead of the reference's 4
    half-stacks, with identical math and weight layout.
    """
    cx = x.shape[-1]
    b, n = x.shape[0], x.shape[1]
    agg_xh = aggregate(supports, jnp.concatenate([x, h], -1), cheb_k)
    z_r = jax.nn.sigmoid(
        agg_xh.reshape(b, n, -1) @ params["gate"]["W"] + params["gate"]["b"])
    z, r = jnp.split(z_r, 2, axis=-1)
    agg_zh = aggregate(supports, z * h, cheb_k)
    hc = jnp.tanh(_project(agg_xh[..., :cx], agg_zh, params["update"]))
    return r * h + (1.0 - r) * hc
