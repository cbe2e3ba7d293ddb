"""Meta-node memory bank: parameters, attention read, top-2 prototype lookup.

Reference: ``model/MegaCRN.py:149-166``. All four parameters are 2-D and
xavier-normal initialised. The attention read and the contrastive pos/neg
lookups are one softmax + two matmuls + a top-k — tiny (M <= 20), always
replicated across the mesh.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from megacrn_tpu.nn.init import xavier_normal


def memory_init(key, num_nodes: int, rnn_units: int, mem_num: int,
                mem_dim: int, dtype=jnp.float32) -> Dict:
    """Memory (M,d), Wq (H,d), We1/We2 (N,M) — model/MegaCRN.py:149-157."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "Memory": xavier_normal(k1, (mem_num, mem_dim), dtype),
        "Wq": xavier_normal(k2, (rnn_units, mem_dim), dtype),
        "We1": xavier_normal(k3, (num_nodes, mem_num), dtype),
        "We2": xavier_normal(k4, (num_nodes, mem_num), dtype),
    }


def query_memory(mem: Dict, h_t: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Attention read + top-2 prototypes (model/MegaCRN.py:159-166).

    h_t: (B, N, H). Returns (value, query, pos, neg), each (B, N, d).
    """
    query = h_t @ mem["Wq"]  # (B, N, d)
    att = jax.nn.softmax(query @ mem["Memory"].T, axis=-1)  # (B, N, M)
    value = att @ mem["Memory"]  # (B, N, d)
    _, ind = jax.lax.top_k(att, 2)  # (B, N, 2), descending like torch.topk
    pos = jnp.take(mem["Memory"], ind[..., 0], axis=0)
    neg = jnp.take(mem["Memory"], ind[..., 1], axis=0)
    return value, query, pos, neg
