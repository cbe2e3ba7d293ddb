"""MegaCRN flagship model: meta-graph + memory + scanned seq2seq.

Functional re-design of ``model/MegaCRN.py:116-194``. One jitted graph covers
the whole forward: meta-graph generation, scanned encoder, memory read,
scanned decoder with in-graph scheduled sampling (the reference flips a host
numpy coin per decoder step, ``model/MegaCRN.py:188-191``; here the Bernoulli
draws come from a threaded PRNG key inside the scan so training stays a single
XLA program — distributional parity, as exact host-RNG parity is impossible).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from megacrn_tpu.config import MegaCRNConfig
from megacrn_tpu.nn.init import torch_linear_bias, torch_linear_weight
from megacrn_tpu.nn.memory import memory_init, query_memory
from megacrn_tpu.nn.seq import (decoder_init, encoder_init, init_hidden,
                                stack_step)
from megacrn_tpu.ops.graph import cheb_aggregate, cheb_aggregate_sparse, meta_graph


class MegaCRNOutput(NamedTuple):
    """The reference forward 5-tuple (model/MegaCRN.py:194)."""

    output: jnp.ndarray  # (B, horizon, N, output_dim)
    h_att: jnp.ndarray  # (B, N, mem_dim)
    query: jnp.ndarray  # (B, N, mem_dim)
    pos: jnp.ndarray  # (B, N, mem_dim)
    neg: jnp.ndarray  # (B, N, mem_dim)


def init_params(key, cfg: MegaCRNConfig, dtype=jnp.float32) -> Dict:
    """Build the parameter pytree with reference-parity initial distributions."""
    k_mem, k_enc, k_dec, k_pw, k_pb = jax.random.split(key, 5)
    params = {
        "memory": memory_init(k_mem, cfg.num_nodes, cfg.rnn_units,
                              cfg.mem_num, cfg.mem_dim, dtype),
        "encoder": encoder_init(k_enc, cfg.input_dim, cfg.rnn_units,
                                cfg.cheb_k, cfg.num_layers,
                                cfg.num_supports, dtype),
        # Decoder input is [go || y_cov]; hidden width rnn_units + mem_dim
        # (model/MegaCRN.py:140-141).
        "decoder": decoder_init(k_dec, cfg.output_dim + cfg.ycov_dim,
                                cfg.decoder_dim, cfg.cheb_k, cfg.num_layers,
                                cfg.num_supports, dtype),
        # proj = nn.Linear(decoder_dim, output_dim) (model/MegaCRN.py:144),
        # stored input-major so apply is x @ W + b.
        "proj": {
            "W": torch_linear_weight(k_pw, (cfg.decoder_dim, cfg.output_dim), dtype),
            "b": torch_linear_bias(k_pb, cfg.decoder_dim, (cfg.output_dim,), dtype),
        },
    }
    return params


def compute_sampling_threshold(cl_decay_steps: int, batches_seen) -> jnp.ndarray:
    """Inverse-sigmoid curriculum threshold (model/MegaCRN.py:146-147)."""
    c = float(cl_decay_steps)
    return c / (c + jnp.exp(batches_seen / c))


def forward(
    params: Dict,
    x: jnp.ndarray,
    y_cov: jnp.ndarray,
    cfg: MegaCRNConfig,
    labels: Optional[jnp.ndarray] = None,
    batches_seen=0,
    rng: Optional[jax.Array] = None,
    training: bool = False,
    shard_fn=None,
    road_supports=None,
    ring_axis: Optional[str] = None,
) -> MegaCRNOutput:
    """Full forward pass (model/MegaCRN.py:168-194).

    x: (B, T, N, input_dim); y_cov: (B, horizon, N, ycov_dim);
    labels: (B, horizon, N, output_dim) — required when training with
    curriculum learning. ``training`` must be a static Python bool.

    ``shard_fn(kind, tensor)`` — optional GSPMD constraint hook (kinds:
    'supports' (S,N,N), 'state' (B,N,H)); used by ``megacrn_tpu.parallel`` to
    pin the node-partitioned layout through the scans so XLA places the
    boundary all-gathers instead of resharding (SURVEY.md section 5,
    node/edge partitioning).

    ``ring_axis`` — set (to the mesh node-axis name) only when this forward
    runs INSIDE a shard_map with x/labels node-sharded: the dense_ring
    backend then builds per-device support row-blocks and aggregates via the
    explicit ppermute ring schedule (megacrn_tpu.parallel.ring). All node-axis
    shapes below derive from x, so they are automatically per-shard sizes.
    """
    if shard_fn is None:
        shard_fn = lambda kind, t: t
    batch = x.shape[0]
    n_nodes = x.shape[2]  # == cfg.num_nodes, or the per-shard node count
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    # Memory read / output accumulate at (at least) f32: upcasts bf16 back,
    # passes f64 through untouched (the float64 parity-control mode).
    acc_dtype = jnp.promote_types(jnp.float32, compute_dtype)
    mem = params["memory"]

    if cfg.graph_backend == "sparse_meta":
        # Learned sparse meta-graph restricted to a static edge pattern
        # (framework extension for large N): SDDMM + masked row softmax +
        # differentiable SpMM, in two granularities — node-level ELL
        # (megacrn_tpu.kernels.sparse_graph_node, O(nnz) pattern bytes, no
        # remat needed) or 128x128 tiles (megacrn_tpu.kernels.sparse_graph).
        from megacrn_tpu.kernels.sparse_graph_node import (
            BucketedNodeELLPattern, NodeELLPattern,
            cheb_aggregate_learned_node, sparse_meta_graph_node)

        if road_supports is None:
            raise ValueError("graph_backend='sparse_meta' requires "
                             "road_supports=NodeELLPattern or BlockPattern")
        pattern = road_supports
        if isinstance(pattern, (NodeELLPattern, BucketedNodeELLPattern)):
            weights = sparse_meta_graph_node(mem["Memory"], mem["We1"],
                                             mem["We2"], pattern)
            if isinstance(pattern, NodeELLPattern):
                # Node-partition the learned graph on a mesh: (N, D) edge
                # weights row-sharded over the node axis.
                weights = tuple(shard_fn("node_weights", w)
                                for w in weights)
            else:
                # Bucketed layout: rows are degree-sorted, so they do not
                # align with contiguous node blocks — but GSPMD needs no
                # alignment, only an even row split of each per-bucket
                # (n_b, D_b) weight array; it inserts the gather/scatter
                # boundary collectives either way. Row-sharding keeps the
                # O(nnz) learned weights (and their SDDMM/softmax compute)
                # partitioned instead of replicated on the mesh.
                weights = tuple(tuple(shard_fn("node_weights", w_b)
                                      for w_b in w) for w in weights)
            supports = weights

            def aggregate(weights_, x_, k_):
                return cheb_aggregate_learned_node(weights_, pattern, x_, k_)

        else:
            from megacrn_tpu.kernels.sparse_graph import (
                cheb_aggregate_learned_sparse, sparse_meta_graph)

            tiles = sparse_meta_graph(mem["Memory"], mem["We1"], mem["We2"],
                                      pattern)
            # Tiles row-blocked over the node axis (GSPMD inserts the x
            # gathers / dtile scatter-adds).
            supports = tuple(shard_fn("tiles", t) for t in tiles)

            def aggregate(tiles_, x_, k_):
                return cheb_aggregate_learned_sparse(tiles_, pattern, x_, k_)

    elif cfg.graph_backend == "road_sparse":
        # Static sparse road supports through the Pallas SpMM kernel; the
        # learned meta-graph is bypassed for aggregation (memory read and
        # contrastive losses remain). cfg.num_supports must equal
        # len(road_supports) so the AGCN weight widths line up.
        from megacrn_tpu.kernels.spmm_coo import StackedRoadPack

        if road_supports is None:
            raise ValueError("graph_backend='road_sparse' requires "
                             "road_supports=[(pack, pack_t), ...] or a "
                             "StackedRoadPack")
        from megacrn_tpu.kernels.spmm_ell_node import (
            BucketedStackedNodeELL, LocalBucketedNodeELL, LocalNodeELL,
            StackedNodeELL, cheb_aggregate_node_ell,
            cheb_aggregate_node_ell_sharded)

        supports = road_supports
        if isinstance(road_supports, (LocalNodeELL, LocalBucketedNodeELL)):
            # Node-partitioned ELL inside shard_map: this device's row
            # block (flat, or shape-uniform degree-bucketed); x node-blocks
            # all-gathered over the mesh node axis.
            if ring_axis is None:
                raise ValueError("LocalNodeELL requires ring_axis (it only "
                                 "exists inside shard_map)")

            def aggregate(pack_, x_, k_):
                return cheb_aggregate_node_ell_sharded(pack_, x_, k_,
                                                       ring_axis)

        elif isinstance(road_supports, (StackedNodeELL,
                                        BucketedStackedNodeELL)):
            # Node-level ELL: gather + weighted reduce, scatter-free; the
            # scalable form for ultra-sparse road graphs where tile-granular
            # packs explode (kernels/spmm_ell_node.py). The bucketed variant
            # pads each degree bucket only to its own max (36-42% less
            # gather traffic on road graphs).
            if road_supports.num_supports != cfg.num_supports:
                raise ValueError("node-ELL pack num_supports != "
                                 "cfg.num_supports")
            aggregate = cheb_aggregate_node_ell
        elif isinstance(road_supports, StackedRoadPack):
            # Production single/DP path: one block-diagonal COO pack drives
            # the whole Chebyshev recursion (ops.graph
            # cheb_aggregate_sparse_stacked) — padding-free, S x fewer
            # kernel launches than per-support Block-ELL.
            from megacrn_tpu.ops.graph import cheb_aggregate_sparse_stacked

            if road_supports.num_supports != cfg.num_supports:
                raise ValueError("StackedRoadPack.num_supports != "
                                 "cfg.num_supports")
            aggregate = cheb_aggregate_sparse_stacked
        elif len(road_supports) != cfg.num_supports:
            raise ValueError("len(road_supports) != cfg.num_supports")
        elif ring_axis is not None:
            # Node-partitioned: per-device row-block packs (built by
            # kernels.spmm.shard_road_packs, entering via shard_map
            # in_specs), x node-blocks all-gathered over the node axis.
            from megacrn_tpu.parallel.ring import cheb_aggregate_sparse_sharded

            def aggregate(packs_, x_, k_):
                return cheb_aggregate_sparse_sharded(packs_, x_, k_,
                                                     ring_axis)
        else:
            aggregate = cheb_aggregate_sparse
    elif cfg.graph_backend == "dense_ring" and ring_axis is not None:
        # Explicit-collective node partition: per-device support row-blocks,
        # aggregation = ring ppermute schedule (communication hidden under
        # the local block-column matmuls). Only valid inside shard_map.
        from megacrn_tpu.parallel.ring import (cheb_aggregate_ring,
                                               local_meta_supports)

        supports = local_meta_supports(mem["Memory"], mem["We1"], mem["We2"],
                                       ring_axis, n_nodes)

        def aggregate(supports_, x_, k_):
            return cheb_aggregate_ring(supports_, x_, k_, ring_axis)

    else:
        # 'dense', or 'dense_ring' outside shard_map (single-device parity
        # path — identical math, XLA-inserted collectives if any).
        supports = shard_fn("supports",
                            meta_graph(mem["Memory"], mem["We1"], mem["We2"]))
        aggregate = cheb_aggregate
    enc_params, dec_params = params["encoder"], params["decoder"]
    if compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        y_cov = y_cov.astype(compute_dtype)
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype), t)
        enc_params, dec_params = cast(enc_params), cast(dec_params)
        if cfg.graph_backend in ("dense", "dense_ring"):
            supports = supports.astype(compute_dtype)
        elif cfg.graph_backend == "sparse_meta":
            # Learned weights: (N, D) arrays, or per-bucket tuples for the
            # bucketed pattern — cast every array leaf either way.
            supports = jax.tree_util.tree_map(
                lambda t: t.astype(compute_dtype), supports)
        elif cfg.graph_backend == "road_sparse":
            # Cast the static tile data; the Pallas kernels accumulate in
            # f32 (preferred_element_type) so only the MXU inputs narrow.
            from megacrn_tpu.kernels.spmm_coo import StackedRoadPack
            from megacrn_tpu.kernels.spmm_ell_node import (
                BucketedStackedNodeELL, LocalBucketedNodeELL, LocalNodeELL,
                StackedNodeELL)

            if isinstance(supports, LocalBucketedNodeELL):
                cast_tt = lambda tt: tuple(
                    tuple(a.astype(compute_dtype) for a in t) for t in tt)
                supports = supports._replace(w=cast_tt(supports.w))
            elif isinstance(supports, LocalNodeELL):
                supports = supports._replace(
                    w=supports.w.astype(compute_dtype))
            elif isinstance(supports, BucketedStackedNodeELL):
                cast_t = lambda t: tuple(a.astype(compute_dtype) for a in t)
                supports = supports._replace(
                    fwd_w=cast_t(supports.fwd_w),
                    bwd_w=cast_t(supports.bwd_w))
            elif isinstance(supports, StackedNodeELL):
                supports = supports._replace(
                    pack=supports.pack._replace(
                        w=supports.pack.w.astype(compute_dtype)),
                    pack_t=supports.pack_t._replace(
                        w=supports.pack_t.w.astype(compute_dtype)))
            elif isinstance(supports, StackedRoadPack):
                supports = supports._replace(
                    pack=supports.pack._replace(
                        data=supports.pack.data.astype(compute_dtype)),
                    pack_t=supports.pack_t._replace(
                        data=supports.pack_t.data.astype(compute_dtype)))
            else:
                supports = [
                    (a._replace(data=a.data.astype(compute_dtype)),
                     a_t._replace(data=a_t.data.astype(compute_dtype)))
                    for a, a_t in supports]

    if (aggregate is cheb_aggregate and cfg.dense_impl == "stacked"
            and not getattr(shard_fn, "node_sharded", False)):
        # Speed path for the dense backends: precompute the row-stacked
        # Chebyshev polynomial matrices once (post-cast, so the N^3 builds
        # run in compute_dtype) and make every aggregation ONE tall matmul
        # (ops/graph.py:cheb_aggregate_prestacked). Skipped under GSPMD node
        # partitioning, where the (S, N, N) row-block layout must survive.
        from megacrn_tpu.ops.graph import (cheb_aggregate_prestacked,
                                           cheb_support_stack)

        poly_stack = cheb_support_stack(supports, cfg.cheb_k)
        num_s = supports.shape[0]

        def aggregate(_supports, x_, k_):
            return cheb_aggregate_prestacked(poly_stack, num_s, x_, k_)

    # --- encoder over T (model/MegaCRN.py:174-176) ---
    enc_states = init_hidden(cfg.num_layers, batch, n_nodes,
                             cfg.rnn_units, compute_dtype)
    x_tm = jnp.swapaxes(x, 0, 1)  # (T, B, N, C)

    def enc_step(states, x_t):
        out, new_states = stack_step(enc_params, x_t, states,
                                     supports, cfg.cheb_k, aggregate)
        new_states = tuple(shard_fn("state", s) for s in new_states)
        return new_states, None

    if cfg.remat:
        # Trade FLOPs for HBM: recompute each cell step in the backward pass
        # instead of storing the (B, N, S*K, C) aggregation stacks.
        enc_step = jax.checkpoint(enc_step)

    enc_states, _ = jax.lax.scan(enc_step, enc_states, x_tm)
    h_t = enc_states[-1].astype(acc_dtype)  # last layer's last state

    # --- memory read (model/MegaCRN.py:178-181) ---
    h_att, query, pos, neg = query_memory(mem, h_t)
    h_t = jnp.concatenate([h_t, h_att], axis=-1)  # (B, N, H + d)
    dec_states = tuple(shard_fn("state", h_t.astype(compute_dtype))
                       for _ in range(cfg.num_layers))  # same tensor per layer

    # --- decoder over horizon with scheduled sampling (:182-192) ---
    use_cl = training and cfg.use_curriculum_learning
    if use_cl:
        if labels is None or rng is None:
            raise ValueError("curriculum training requires labels and rng")
        threshold = compute_sampling_threshold(cfg.cl_decay_steps,
                                               jnp.asarray(batches_seen,
                                                           jnp.float32))
        step_keys = jax.random.split(rng, cfg.horizon)
        coins = jax.vmap(lambda k: jax.random.uniform(k))(step_keys)
        use_truth = coins < threshold  # (horizon,)
        labels_tm = jnp.swapaxes(labels.astype(compute_dtype), 0, 1)
    else:
        use_truth = jnp.zeros((cfg.horizon,), bool)
        labels_tm = jnp.zeros(
            (cfg.horizon, batch, n_nodes, cfg.output_dim), compute_dtype)

    y_cov_tm = jnp.swapaxes(y_cov, 0, 1)  # (horizon, B, N, ycov)
    go0 = jnp.zeros((batch, n_nodes, cfg.output_dim), compute_dtype)
    proj_w = params["proj"]["W"].astype(compute_dtype)
    proj_b = params["proj"]["b"].astype(compute_dtype)

    def dec_step(carry, inp):
        go, states = carry
        y_cov_t, label_t, use_truth_t = inp
        x_t = jnp.concatenate([go, y_cov_t], axis=-1)
        h_de, states = stack_step(dec_params, x_t, states,
                                  supports, cfg.cheb_k, aggregate)
        states = tuple(shard_fn("state", s) for s in states)
        out_t = h_de @ proj_w + proj_b
        go_next = jnp.where(use_truth_t, label_t, out_t)
        return (go_next, states), out_t

    if cfg.remat:
        dec_step = jax.checkpoint(dec_step)

    (_, _), outs = jax.lax.scan(
        dec_step, (go0, dec_states), (y_cov_tm, labels_tm, use_truth))
    output = jnp.swapaxes(outs, 0, 1).astype(acc_dtype)

    return MegaCRNOutput(output, h_att, query, pos, neg)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
