"""GTS baseline: graph-structure-learning seq2seq (``model/GTS.py:338-454``).

Proves the framework generalises beyond MegaCRN: a second model family with a
Gumbel-softmax discrete graph learner (straight-through), a Conv1d feature
extractor over the entire training series, DCGRU recurrence, and a kNN-prior
BCE auxiliary loss (harness side).

Functional design: parameters + BatchNorm running stats are explicit pytrees;
the whole forward (feature extractor -> pairwise scorer -> Gumbel sample ->
scanned encoder/decoder) is one jitted graph. The Gumbel draw and scheduled
sampling consume a threaded PRNG key; ``gumbel_noise=False`` gives the
deterministic variant used for activation-parity tests.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from megacrn_tpu.config import GTSConfig
from megacrn_tpu.nn.dcgru import dcgru_cell_apply, dcgru_cell_init
from megacrn_tpu.nn.init import torch_linear_bias, torch_linear_weight
from megacrn_tpu.nn.norm import bn_apply, bn_init


class GTSOutput(NamedTuple):
    output: jnp.ndarray  # (B, horizon, N, output_dim)
    adj_prob: jnp.ndarray  # (N, N) soft edge probabilities (BCE target side)
    adj_sample: jnp.ndarray  # (N, N) hard sampled adjacency (diagnostic)
    bn_state: Dict  # updated BatchNorm running stats


def _conv1d_init(key, in_c: int, out_c: int, k: int, dtype=jnp.float32):
    fan_in = in_c * k
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "W": jax.random.uniform(kw, (out_c, in_c, k), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
    }


def _linear_init(key, dim_in: int, dim_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {"W": torch_linear_weight(kw, (dim_in, dim_out), dtype),
            "b": torch_linear_bias(kb, dim_in, (dim_out,), dtype)}


def init_params(key, cfg: GTSConfig, dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Returns (params, bn_state)."""
    ks = jax.random.split(key, 10)
    bn1_p, bn1_s = bn_init(8, dtype)
    bn2_p, bn2_s = bn_init(16, dtype)
    bn3_p, bn3_s = bn_init(cfg.embedding_dim, dtype)
    enc_keys = jax.random.split(ks[6], cfg.num_layers)
    dec_keys = jax.random.split(ks[7], cfg.num_layers)
    params = {
        "conv1": _conv1d_init(ks[0], 1, 8, 10, dtype),
        "conv2": _conv1d_init(ks[1], 8, 16, 10, dtype),
        "fc": _linear_init(ks[2], cfg.dim_fc, cfg.embedding_dim, dtype),
        "fc_out": _linear_init(ks[3], 2 * cfg.embedding_dim,
                               cfg.embedding_dim, dtype),
        "fc_cat": _linear_init(ks[4], cfg.embedding_dim, 2, dtype),
        "bn1": bn1_p, "bn2": bn2_p, "bn3": bn3_p,
        # Encoder layer 0 consumes input_dim; decoder layer 0 consumes
        # output_dim (decoder input is the previous projected output,
        # GTS.py:396-403); deeper layers consume rnn_units.
        "encoder": [dcgru_cell_init(
            enc_keys[i], cfg.input_dim if i == 0 else cfg.rnn_units,
            cfg.rnn_units, cfg.max_diffusion_step, dtype)
            for i in range(cfg.num_layers)],
        "decoder": [dcgru_cell_init(
            dec_keys[i], cfg.output_dim if i == 0 else cfg.rnn_units,
            cfg.rnn_units, cfg.max_diffusion_step, dtype)
            for i in range(cfg.num_layers)],
        "proj": _linear_init(ks[5], cfg.rnn_units, cfg.output_dim, dtype),
    }
    bn_state = {"bn1": bn1_s, "bn2": bn2_s, "bn3": bn3_s}
    return params, bn_state


def _conv1d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C_in, L) VALID conv, stride 1 (GTS.py:350-351)."""
    y = jax.lax.conv_general_dilated(
        x, p["W"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["b"][None, :, None]


def node_embeddings(params: Dict, bn_state: Dict, node_feas: jnp.ndarray,
                    training: bool, compute_dtype=jnp.float32
                    ) -> Tuple[jnp.ndarray, Dict]:
    """Conv1d feature extractor over the whole training series
    (GTS.py:423-434). node_feas: (T_train, N) -> (N, embedding_dim).

    ``compute_dtype=bfloat16`` narrows the conv/fc MXU inputs (the
    extractor is the measured 56% of the GTS step at T=23990); BatchNorm
    runs in f32 so the running statistics keep full precision."""
    cd = jnp.dtype(compute_dtype)
    cast_p = lambda p: {k: v.astype(cd) for k, v in p.items()}
    x = node_feas.T[:, None, :].astype(cd)  # (N, 1, T)
    x = _conv1d(cast_p(params["conv1"]), x)
    x = jax.nn.relu(x)
    x, bn1 = bn_apply(params["bn1"], bn_state["bn1"],
                      x.astype(jnp.float32), training)
    x = _conv1d(cast_p(params["conv2"]), x.astype(cd))
    x = jax.nn.relu(x)
    x, bn2 = bn_apply(params["bn2"], bn_state["bn2"],
                      x.astype(jnp.float32), training)
    x = x.reshape(x.shape[0], -1)  # (N, 16*(T-18))
    x = (x.astype(cd) @ params["fc"]["W"].astype(cd)
         + params["fc"]["b"].astype(cd))
    x = jax.nn.relu(x.astype(jnp.float32))
    x, bn3 = bn_apply(params["bn3"], bn_state["bn3"], x, training)
    return x, {"bn1": bn1, "bn2": bn2, "bn3": bn3}


def pairwise_logits(params: Dict, emb: jnp.ndarray) -> jnp.ndarray:
    """All-pairs edge logits (GTS.py:436-440): pair p = (i, j) row-major;
    features = [sender_j || receiver_i] -> fc_out -> relu -> fc_cat."""
    n = emb.shape[0]
    receivers = jnp.repeat(emb, n, axis=0)  # i varies slowly
    senders = jnp.tile(emb, (n, 1))  # j varies quickly
    x = jnp.concatenate([senders, receivers], axis=1)
    x = jax.nn.relu(x @ params["fc_out"]["W"] + params["fc_out"]["b"])
    return x @ params["fc_cat"]["W"] + params["fc_cat"]["b"]  # (N*N, 2)


def gumbel_softmax_hard(logits: jnp.ndarray, temperature: float,
                        rng: Optional[jax.Array], eps: float = 1e-20
                        ) -> jnp.ndarray:
    """Straight-through Gumbel-softmax (GTS.py:228-257). rng=None disables
    the noise (deterministic argmax path for parity tests)."""
    if rng is not None:
        u = jax.random.uniform(rng, logits.shape)
        logits = logits + (-jnp.log(-jnp.log(u + eps) + eps))
    y_soft = jax.nn.softmax(logits / temperature, axis=-1)
    y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), logits.shape[-1],
                            dtype=y_soft.dtype)
    return jax.lax.stop_gradient(y_hard - y_soft) + y_soft


def sample_graph(params: Dict, bn_state: Dict, node_feas: jnp.ndarray,
                 cfg: GTSConfig, rng: Optional[jax.Array] = None,
                 training: bool = False) -> Tuple:
    """The graph-learner half of the forward (GTS.py:423-444): extractor ->
    pairwise scorer -> straight-through Gumbel sample. ``rng=None`` is the
    deterministic argmax path (eval/serving). Returns
    (adj, adj_prob, new_bn_state) — adj depends only on
    (params, bn_state, node_feas, rng), NOT on the batch, so serving can
    compute it once and reuse it across requests."""
    cd = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))
    emb, new_bn_state = node_embeddings(params, bn_state, node_feas,
                                        training, compute_dtype=cd)
    logits = pairwise_logits(params, emb)
    sample = gumbel_softmax_hard(logits, cfg.temperature, rng)
    adj = sample[:, 0].reshape(cfg.num_nodes, cfg.num_nodes)
    adj = adj * (1.0 - jnp.eye(cfg.num_nodes, dtype=adj.dtype))  # zero diag
    adj_prob = jax.nn.softmax(logits, axis=-1)[:, 0].reshape(
        cfg.num_nodes, cfg.num_nodes)
    return adj, adj_prob, new_bn_state


def forward(
    params: Dict,
    bn_state: Dict,
    x: jnp.ndarray,
    node_feas: Optional[jnp.ndarray],
    cfg: GTSConfig,
    labels: Optional[jnp.ndarray] = None,
    batches_seen=0,
    rng: Optional[jax.Array] = None,
    training: bool = False,
    gumbel_noise: bool = True,
    graph: Optional[Tuple] = None,
) -> GTSOutput:
    """Full GTS forward (GTS.py:412-454).

    x: (B, T, N, input_dim); node_feas: (T_train, N) normalized training
    series; labels: (B, horizon, N, output_dim). ``graph``: optional
    precomputed (adj, adj_prob) pair from ``sample_graph`` — skips the
    extractor/sampler entirely (serving reuses one sampled graph across
    requests; node_feas may then be None).
    """
    batch = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_gumbel, k_cl = jax.random.split(rng)
    cd = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))

    if graph is not None:
        adj, adj_prob = graph
        new_bn_state = bn_state
    else:
        adj, adj_prob, new_bn_state = sample_graph(
            params, bn_state, node_feas, cfg,
            rng=k_gumbel if gumbel_noise else None, training=training)

    # --- encoder (GTS.py:375-385) ---
    # bf16 mode: recurrence matmul inputs narrow; the sampled adj (and the
    # straight-through gradient path through it) stays f32 — the support's
    # degree normalisation and the gate nonlinearities see bf16 operands
    # only inside the cells.
    enc_params, dec_params, proj_p = (params["encoder"], params["decoder"],
                                      params["proj"])
    if cd != jnp.float32:
        cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(cd), t)
        enc_params, dec_params, proj_p = (cast(enc_params),
                                          cast(dec_params), cast(proj_p))
        x = x.astype(cd)
    states = tuple(jnp.zeros((batch, cfg.num_nodes, cfg.rnn_units), x.dtype)
                   for _ in range(cfg.num_layers))
    x_tm = jnp.swapaxes(x, 0, 1)

    def stack(layer_params, states, inp):
        new_states = []
        for p, h in zip(layer_params, states):
            h_new = dcgru_cell_apply(p, inp, h, adj, cfg.max_diffusion_step)
            new_states.append(h_new)
            inp = h_new
        return inp, tuple(new_states)

    def enc_step(states, x_t):
        _, new_states = stack(enc_params, states, x_t)
        return new_states, None

    states, _ = jax.lax.scan(enc_step, states, x_tm)

    # --- decoder with scheduled sampling (GTS.py:387-410) ---
    use_cl = training and cfg.use_curriculum_learning
    if use_cl:
        if labels is None:
            raise ValueError("curriculum training requires labels")
        c = float(cfg.cl_decay_steps)
        threshold = c / (c + jnp.exp(jnp.asarray(batches_seen, jnp.float32) / c))
        coins = jax.random.uniform(k_cl, (cfg.horizon,))
        use_truth = coins < threshold
        labels_tm = jnp.swapaxes(labels.astype(x.dtype), 0, 1)
    else:
        use_truth = jnp.zeros((cfg.horizon,), bool)
        labels_tm = jnp.zeros(
            (cfg.horizon, batch, cfg.num_nodes, cfg.output_dim), x.dtype)

    go0 = jnp.zeros((batch, cfg.num_nodes, cfg.output_dim), x.dtype)

    def dec_step(carry, inp):
        go, states = carry
        label_t, use_truth_t = inp
        h_top, states = stack(dec_params, states, go)
        out_t = h_top @ proj_p["W"] + proj_p["b"]
        go_next = jnp.where(use_truth_t, label_t, out_t)
        return (go_next, states), out_t

    (_, _), outs = jax.lax.scan(dec_step, (go0, states),
                                (labels_tm, use_truth))
    output = jnp.swapaxes(outs, 0, 1).astype(jnp.float32)
    return GTSOutput(output, adj_prob, adj, new_bn_state)
