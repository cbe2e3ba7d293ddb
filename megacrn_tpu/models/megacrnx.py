"""MegaCRNx: the older ablation generation of the model family.

Reference: ``model_futurework/MegaCRNx.py`` (flagged by its directory marker
as the superseded design with the data-leak bug — the leak lives in its
harness protocol, not in this math). Kept as ablation configs per SURVEY.md
2.1: single-support AGCN built from node embeddings inside the conv
(``MegaCRNx.py:15-30``), free ``node_embeddings (N, embed_dim)``, memory read
producing per-batch *meta node embeddings* ``W_E = (att @ Memory) @ FC_E``
(``:169-178``), ablation flags ``memory_type`` / ``meta_type`` /
``decoder_type in {sequence, stepwise}`` (``:118-158``), and **no curriculum
learning**.

Parity notes:
* 3-D (meta) embeddings build the support via a batch-summed outer product
  ``einsum('bnc,bmc->nm')`` (``:21``) — one shared N x N support, not
  per-batch.
* The support softmax is ``dim=1`` here (``:18,21``) — axis 1 of (N, N),
  which for the 2-D case equals the canonical model's ``dim=-1``.
* Weight width is ``cheb_k * dim_in`` (single support, ``:10``).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

import dataclasses

from megacrn_tpu.nn.init import torch_linear_bias, torch_linear_weight, xavier_normal
from megacrn_tpu.ops.graph import cheb_aggregate


@dataclasses.dataclass(frozen=True)
class MegaCRNxConfig:
    num_nodes: int = 207
    input_dim: int = 1
    output_dim: int = 1
    horizon: int = 12
    seq_len: int = 12
    rnn_units: int = 32
    num_layers: int = 1
    embed_dim: int = 8
    cheb_k: int = 3
    ycov_dim: int = 1
    mem_num: int = 10
    mem_dim: int = 32
    # Matmul-input dtype: "float32" (parity default) | "bfloat16" (MXU
    # speed mode; the meta-graph softmax and memory read stay f32).
    compute_dtype: str = "float32"
    memory_type: bool = True
    meta_type: bool = True
    decoder_type: str = "stepwise"  # "sequence" | "stepwise"

    @property
    def decoder_dim(self) -> int:
        return self.rnn_units + (self.mem_dim if self.memory_type else 0)


class MegaCRNxOutput(NamedTuple):
    output: jnp.ndarray
    h_att: Optional[jnp.ndarray]
    query: Optional[jnp.ndarray]
    pos: Optional[jnp.ndarray]
    neg: Optional[jnp.ndarray]


def _cell_init(key, dim_in, dim_out, cheb_k, dtype=jnp.float32):
    kg, ku = jax.random.split(key)
    return {
        "gate": {"W": xavier_normal(kg, (cheb_k * (dim_in + dim_out), 2 * dim_out), dtype),
                 "b": jnp.zeros((2 * dim_out,), dtype)},
        "update": {"W": xavier_normal(ku, (cheb_k * (dim_in + dim_out), dim_out), dtype),
                   "b": jnp.zeros((dim_out,), dtype)},
    }


def _stack_init(key, dim_in, dim_out, cheb_k, num_layers, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers)
    return [_cell_init(keys[i], dim_in if i == 0 else dim_out, dim_out,
                       cheb_k, dtype) for i in range(num_layers)]


def init_params(key, cfg: MegaCRNxConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 7)
    dec_in = (cfg.ycov_dim if cfg.decoder_type == "sequence"
              else cfg.output_dim + cfg.ycov_dim)
    return {
        "node_embeddings": jax.random.normal(
            ks[0], (cfg.num_nodes, cfg.embed_dim), dtype),  # torch.randn init
        "memory": {
            "Memory": xavier_normal(ks[1], (cfg.mem_num, cfg.mem_dim), dtype),
            "Wq": xavier_normal(ks[2], (cfg.rnn_units, cfg.mem_dim), dtype),
            "FC_E": xavier_normal(ks[3], (cfg.mem_dim, cfg.embed_dim), dtype),
        },
        "encoder": _stack_init(ks[4], cfg.input_dim, cfg.rnn_units,
                               cfg.cheb_k, cfg.num_layers, dtype),
        "decoder": _stack_init(ks[5], dec_in, cfg.decoder_dim, cfg.cheb_k,
                               cfg.num_layers, dtype),
        "proj": {
            "W": torch_linear_weight(
                jax.random.split(ks[6])[0], (cfg.decoder_dim, cfg.output_dim), dtype),
            "b": torch_linear_bias(
                jax.random.split(ks[6])[1], cfg.decoder_dim, (cfg.output_dim,), dtype),
        },
    }


def support_from_embeddings(emb: jnp.ndarray) -> jnp.ndarray:
    """MegaCRNx.py:15-21: single support softmax(relu(E E^T), axis=1);
    3-D (B, N, e) embeddings are contracted over batch first."""
    if emb.ndim == 2:
        logits = jax.nn.relu(emb @ emb.T)
    else:
        logits = jax.nn.relu(jnp.einsum("bnc,bmc->nm", emb, emb))
    return jax.nn.softmax(logits, axis=1)


def _cell_apply(p, x, h, support, cheb_k):
    """Same gate-role math as the canonical cell, single support."""
    supports = support[None]  # (1, N, N)
    b, n = x.shape[0], x.shape[1]
    cx = x.shape[-1]
    agg_xh = cheb_aggregate(supports, jnp.concatenate([x, h], -1), cheb_k)
    z_r = jax.nn.sigmoid(
        agg_xh.reshape(b, n, -1) @ p["gate"]["W"] + p["gate"]["b"])
    z, r = jnp.split(z_r, 2, axis=-1)
    agg_zh = cheb_aggregate(supports, z * h, cheb_k)
    cand = jnp.concatenate([agg_xh[..., :cx], agg_zh], -1)
    hc = jnp.tanh(cand.reshape(b, n, -1) @ p["update"]["W"] + p["update"]["b"])
    return r * h + (1.0 - r) * hc


def _stack(layer_params, states, inp, support, cheb_k):
    new_states = []
    for p, h in zip(layer_params, states):
        h = _cell_apply(p, inp, h, support, cheb_k)
        new_states.append(h)
        inp = h
    return inp, tuple(new_states)


def query_memory(mem: Dict, h_t: jnp.ndarray):
    """MegaCRNx.py:169-178 — returns (W_E, proto, query, pos, neg)."""
    query = h_t @ mem["Wq"]
    att = jax.nn.softmax(query @ mem["Memory"].T, axis=-1)
    proto = att @ mem["Memory"]
    w_e = proto @ mem["FC_E"]  # (B, N, embed_dim) meta node embeddings
    _, ind = jax.lax.top_k(att, 2)
    pos = jnp.take(mem["Memory"], ind[..., 0], axis=0)
    neg = jnp.take(mem["Memory"], ind[..., 1], axis=0)
    return w_e, proto, query, pos, neg


def forward(params: Dict, x: jnp.ndarray, y_cov: jnp.ndarray,
            cfg: MegaCRNxConfig) -> MegaCRNxOutput:
    """MegaCRNx.py:180-214. Deterministic (no curriculum/PRNG).

    ``compute_dtype="bfloat16"`` narrows the recurrence/projection matmul
    inputs; support softmaxes and the memory read keep f32 (the same
    policy as the MegaCRN flagship's bf16 mode)."""
    batch = x.shape[0]
    cd = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))
    acc = jnp.promote_types(jnp.float32, cd)
    enc_support = support_from_embeddings(params["node_embeddings"])
    enc_params, dec_params = params["encoder"], params["decoder"]
    if cd != jnp.float32:
        cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(cd), t)
        enc_params, dec_params = cast(enc_params), cast(dec_params)
        x = x.astype(cd)
        y_cov = y_cov.astype(cd)
        enc_support = enc_support.astype(cd)

    states = tuple(jnp.zeros((batch, cfg.num_nodes, cfg.rnn_units), x.dtype)
                   for _ in range(cfg.num_layers))

    def enc_step(states, x_t):
        _, states = _stack(enc_params, states, x_t, enc_support,
                           cfg.cheb_k)
        return states, None

    states, _ = jax.lax.scan(enc_step, states, jnp.swapaxes(x, 0, 1))
    h_t = states[-1].astype(acc)

    h_att = query = pos = neg = None
    if cfg.memory_type:
        meta_emb, h_att, query, pos, neg = query_memory(params["memory"], h_t)
        h_t = jnp.concatenate([h_t, h_att], axis=-1)
        dec_emb = meta_emb if cfg.meta_type else params["node_embeddings"]
    else:
        if cfg.meta_type:
            raise ValueError(
                "meta graph must derive from memory (MegaCRNx.py:194)")
        dec_emb = params["node_embeddings"]

    dec_support = support_from_embeddings(dec_emb.astype(acc)).astype(cd)
    dec_states = tuple(h_t.astype(cd) for _ in range(cfg.num_layers))
    proj_w = params["proj"]["W"].astype(cd)
    proj_b = params["proj"]["b"].astype(cd)

    if cfg.decoder_type == "sequence":
        def seq_step(states, yc_t):
            top, states = _stack(dec_params, states, yc_t,
                                 dec_support, cfg.cheb_k)
            return states, top

        _, h_de = jax.lax.scan(seq_step, dec_states,
                               jnp.swapaxes(y_cov, 0, 1))
        output = jnp.swapaxes(h_de @ proj_w + proj_b, 0, 1).astype(acc)
    elif cfg.decoder_type == "stepwise":
        go0 = jnp.zeros((batch, cfg.num_nodes, cfg.output_dim), x.dtype)

        def dec_step(carry, yc_t):
            go, states = carry
            top, states = _stack(dec_params, states,
                                 jnp.concatenate([go, yc_t], -1),
                                 dec_support, cfg.cheb_k)
            out_t = top @ proj_w + proj_b
            return (out_t, states), out_t

        (_, _), outs = jax.lax.scan(dec_step, (go0, dec_states),
                                    jnp.swapaxes(y_cov, 0, 1))
        output = jnp.swapaxes(outs, 0, 1).astype(acc)
    else:
        raise ValueError(f"unknown decoder_type {cfg.decoder_type!r}")

    return MegaCRNxOutput(output, h_att, query, pos, neg)
