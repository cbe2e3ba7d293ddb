"""Sharded training/eval steps over a device mesh.

Same math as ``megacrn_tpu.train.steps``; two partitioning styles:

* **GSPMD** (``make_sharded_train_step``): the jitted step picks up shardings
  from its committed inputs (place params with ``shard_params``, batches with
  ``shard_batch``) and pins the internal node-partitioned layout with
  ``with_sharding_constraint`` hooks so XLA inserts the boundary all-gathers
  over the ``node`` axis and psums gradients over ``data``. Covers the dense
  backend and the XLA-program ``sparse_meta`` backend (its gathers + batched
  tile einsums are GSPMD-partitionable).
* **shard_map** (``make_shardmap_train_step``): explicit data-parallel step —
  each device runs the WHOLE forward/backward on its batch shard and grads
  are ``pmean``'d over ``data``. This is the multi-chip path for graph
  backends built on Pallas custom calls (``road_sparse``): GSPMD cannot
  partition through a custom call, but under shard_map the kernel simply runs
  per-device on local data. Params/supports are replicated (the sparse road
  pack at nnz ~ 4N is small; batch is the scaling axis for DP).

Multi-host entry is ``jax.distributed.initialize`` by the caller; everything
here only assumes a ``Mesh``. The reference has no distributed code at all
(SURVEY.md section 2.5) — this layer is green-field TPU design.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # noqa: F401

from megacrn_tpu.config import MegaCRNConfig, TrainConfig
from megacrn_tpu.models import megacrn
from megacrn_tpu.ops import losses
from megacrn_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS, make_shard_fn
from megacrn_tpu.train.steps import (composite_loss, join_support_arrays,
                                     split_support_arrays)
from megacrn_tpu.ops.scaling import inverse_transform


def make_sharded_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    donate: bool = True,
    road_supports=None,
) -> Callable:
    """Jitted ``(params, opt_state, x, y, y_cov, batches_seen, rng) ->
    (params, opt_state, loss)``. Inputs must be placed on the mesh
    (``shard_params`` / ``shard_batch``); params and opt_state buffers are
    donated so the update is in-place in HBM. ``road_supports`` feeds the
    ``sparse_meta`` backend (a BlockPattern, closed over as a constant);
    for the Pallas ``road_sparse`` backend use ``make_shardmap_train_step``.
    """
    if model_cfg.graph_backend == "road_sparse":
        raise ValueError(
            "graph_backend='road_sparse' is a Pallas custom call that GSPMD "
            "cannot partition; use make_shardmap_train_step for meshes")
    if model_cfg.graph_backend == "dense_ring":
        raise ValueError(
            "graph_backend='dense_ring' is an explicit-collective schedule; "
            "use make_ring_train_step")
    shard_fn = make_shard_fn(mesh)

    def loss_fn(params, x, y, y_cov, batches_seen, rng):
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True, shard_fn=shard_fn,
                              road_supports=road_supports)
        return composite_loss(out, y, train_cfg, scaler_mean, scaler_std)

    def step(params, opt_state, x, y, y_cov, batches_seen, rng):
        # Same per-step key derivation as the single-device and shard_map
        # steps: fold the step counter in on-device so every batch in an
        # epoch draws fresh scheduled-sampling coins (the reference flips a
        # new host coin per decoder step, model/MegaCRN.py:188-191).
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, y_cov, batches_seen, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_sharded_eval_forward(model_cfg: MegaCRNConfig, mesh: Mesh,
                              road_supports=None) -> Callable:
    if model_cfg.graph_backend == "road_sparse":
        raise ValueError(
            "use make_shardmap_eval_forward for the road_sparse backend")
    shard_fn = make_shard_fn(mesh)

    @jax.jit
    def fwd(params, x, y_cov):
        return megacrn.forward(params, x, y_cov, model_cfg,
                               shard_fn=shard_fn,
                               road_supports=road_supports)

    return fwd


def _global_masked_loss(out, y, train_cfg, scaler_mean, scaler_std, axes):
    """Composite objective with GLOBAL normalisation inside shard_map: the
    masked-MAE numerator/denominator are psum'd over ``axes`` before the one
    division, so shards with uneven mask density still reproduce the exact
    single-device masked mean; aux losses are plain means, pmean'd."""
    if train_cfg.pred_loss == "masked_mae_inv":
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        y_true = inverse_transform(y, scaler_std, scaler_mean)
        num, den = losses.masked_mae_sums(y_pred, y_true)
        num = jax.lax.psum(num, axes)
        den = jax.lax.psum(den, axes)
        # den is a mask count (0 or >= 1); num == 0 whenever den == 0, so
        # the max() guard yields exactly masked_mae_loss's 0-or-ratio
        # without a NaN-producing where branch in the backward pass.
        pred_loss = num / jnp.maximum(den, 1.0)
    elif train_cfg.pred_loss == "l1_normalized":
        # Exact global mean: psum element sum and element count separately,
        # divide once — correct even if a future loader produces uneven
        # shards (a pmean of per-shard means would silently skew then).
        err = jnp.abs(out.output - y)
        total = jax.lax.psum(jnp.sum(err), axes)
        count = jax.lax.psum(jnp.asarray(err.size, err.dtype), axes)
        pred_loss = total / count
    else:
        raise ValueError(f"unknown pred_loss {train_cfg.pred_loss!r}")
    aux = losses.megacrn_aux_losses(out.query, out.pos, out.neg,
                                    train_cfg.lamb, train_cfg.lamb1)
    return pred_loss + jax.lax.pmean(aux, axes)


def make_shardmap_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    donate: bool = True,
    road_supports=None,
) -> Callable:
    """Explicit data-parallel train step (shard_map over the ``data`` axis).

    Works with EVERY graph backend including the Pallas ``road_sparse``
    kernel: the custom call executes per-device on the local batch shard,
    so no partitioning of the kernel itself is needed.

    The masked-MAE objective normalises by the GLOBAL mask mean: each shard
    computes local (masked-error-sum, mask-count) pairs, both are ``psum``'d
    over ``data``, and the division happens once — exact single-device
    semantics even when zero-masked targets are distributed unevenly across
    batch shards (a pmean of per-shard masked means would not be). The loss
    therefore already contains collectives; gradients come back as per-shard
    contributions to the global loss and are ``psum``'d.

    The curriculum RNG is replicated, so every shard draws the SAME
    per-horizon-step coins — matching single-device semantics exactly
    (the reference flips one host coin per decoder step for the whole
    batch, model/MegaCRN.py:188-191).

    The graph constant's array leaves enter as replicated runtime args
    (``split_support_arrays``) so the program size stays independent of nnz
    (remote-compile body limit at large N).
    """
    skel, sup_arrays = split_support_arrays(road_supports)

    def loss_fn(params, x, y, y_cov, batches_seen, rng, sup):
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True,
                              road_supports=join_support_arrays(skel, sup))
        return _global_masked_loss(out, y, train_cfg, scaler_mean,
                                   scaler_std, DATA_AXIS)

    rep = P()
    bspec = P(DATA_AXIS)  # leading batch axis; rest replicated

    def step(params, opt_state, x, y, y_cov, batches_seen, rng, sup):
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, y_cov, batches_seen, rng, sup)
        # loss_fn contains the collectives, so every device seeds cotangent
        # 1 for the SAME global loss and the psum/pmean transposes make each
        # per-device grad P x (that device's data contribution); pmean both
        # sums the contributions and cancels the P overcount — the exact
        # global gradient.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sup_spec = jax.tree_util.tree_map(lambda _: rep, sup_arrays)
    mapped = shard_map(step, mesh=mesh,
                       in_specs=(rep, rep, bspec, bspec, bspec, rep, rep,
                                 sup_spec),
                       out_specs=(rep, rep, rep), check_rep=False)
    donate_argnums = (0, 1) if donate else ()
    jitted = jax.jit(mapped, donate_argnums=donate_argnums)

    def run(params, opt_state, x, y, y_cov, batches_seen, rng):
        return jitted(params, opt_state, x, y, y_cov, batches_seen, rng,
                      sup_arrays)

    # Compiled-memory telemetry handle (train/loop.py:_log_compiled_memory).
    run._jitted = jitted
    run._extra_args = (sup_arrays,)
    return run


def make_ring_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    donate: bool = True,
) -> Callable:
    """Explicit-collective node-partitioned + data-parallel train step.

    The whole forward/backward runs inside one shard_map over the full
    ``(data, node)`` mesh: the batch is sharded over ``data``, the node axis
    of x/y/y_cov/states over ``node``, and every ``support @ x`` aggregation
    is the explicit ring ppermute schedule (megacrn_tpu.parallel.ring) —
    boundary exchange overlapped with local block-column matmuls, the
    SURVEY section 5 north-star. Params (incl. We1/We2, small at N x M) are
    replicated; each device builds only its row-block of the meta-graph
    supports. Requires num_nodes and batch divisible by the respective mesh
    axes. Backend must be 'dense_ring'.

    Loss normalisation is global exactly as in ``make_shardmap_train_step``
    (psum of masked sums over BOTH axes), and grads are pmean'd over both
    axes, which sums the per-device contributions and cancels the
    every-device-seeds-cotangent-1 overcount.
    """
    if model_cfg.graph_backend != "dense_ring":
        raise ValueError("make_ring_train_step requires "
                         "graph_backend='dense_ring'")
    axes = (DATA_AXIS, NODE_AXIS)

    def loss_fn(params, x, y, y_cov, batches_seen, rng):
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True, ring_axis=NODE_AXIS)
        return _global_masked_loss(out, y, train_cfg, scaler_mean,
                                   scaler_std, axes)

    rep = P()
    bspec = P(DATA_AXIS, None, NODE_AXIS, None)  # (B, T, N, C)

    def step(params, opt_state, x, y, y_cov, batches_seen, rng):
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, y_cov, batches_seen, rng)
        grads = jax.lax.pmean(grads, axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    mapped = shard_map(step, mesh=mesh,
                       in_specs=(rep, rep, bspec, bspec, bspec, rep, rep),
                       out_specs=(rep, rep, rep), check_rep=False)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(mapped, donate_argnums=donate_argnums)


def make_road_node_train_step(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    sharded_packs,
    scaler_mean: float = 0.0,
    scaler_std: float = 1.0,
    donate: bool = True,
) -> Callable:
    """Node-partitioned + data-parallel train step for the Pallas
    ``road_sparse`` backend.

    The ``dense_ring`` step materialises per-device row-blocks of the dense
    learned supports; here the supports are STATIC sparse road matrices, so
    each device instead holds the BlockELL packs of its node rows
    (``kernels.spmm.shard_road_packs``), entering through shard_map in_specs
    (leading device dim split over ``node``) — packs are traced per-device
    arguments, not replicated closure constants. Aggregation all-gathers the
    x node-blocks over the node axis and runs the SpMM kernel on local rows
    only (``parallel.ring.cheb_aggregate_sparse_sharded``); the tiled
    all_gather's VJP contributes the psum_scatter for dx.

    Loss/gradient construction is identical to ``make_ring_train_step``.
    Returns jitted ``(params, opt_state, x, y, y_cov, batches_seen, rng) ->
    (params, opt_state, loss)``; batches must be placed with ``shard_batch``.
    """
    from megacrn_tpu.kernels.spmm import ShardedRoadPacks, local_packs
    from megacrn_tpu.kernels.spmm_ell_node import (BucketedShardedNodeELL,
                                                   ShardedNodeELL,
                                                   local_node_ell)

    if model_cfg.graph_backend != "road_sparse":
        raise ValueError("make_road_node_train_step requires "
                         "graph_backend='road_sparse'")
    if isinstance(sharded_packs, (ShardedNodeELL, BucketedShardedNodeELL)):
        # Every pack leaf (flat (D, S, n_loc, Dmax) arrays, or the bucketed
        # per-support/per-bucket (D, n_b, D_b) + (D, n_loc) inv arrays)
        # carries the device dim first — one tree_map builds the spec.
        to_local = local_node_ell
        pspec = jax.tree_util.tree_map(lambda _: P(NODE_AXIS), sharded_packs)
    elif isinstance(sharded_packs, ShardedRoadPacks):
        to_local = local_packs
        # (S, D, ...) pack arrays: device dim over node, rest local. The
        # spec container must flatten to the same pytree structure (incl.
        # the static dims in aux), so it is built with the real n_loc/n_full.
        pspec = ShardedRoadPacks(
            *(P(None, NODE_AXIS) for _ in range(6)),
            n_loc=sharded_packs.n_loc, n_full=sharded_packs.n_full)
    else:
        raise ValueError("sharded_packs must come from "
                         "kernels.spmm.shard_road_packs or "
                         "kernels.spmm_ell_node.shard_node_ell")
    axes = (DATA_AXIS, NODE_AXIS)

    def loss_fn(params, packs_arrays, x, y, y_cov, batches_seen, rng):
        packs = to_local(packs_arrays)
        out = megacrn.forward(params, x, y_cov, model_cfg, labels=y,
                              batches_seen=batches_seen, rng=rng,
                              training=True, road_supports=packs,
                              ring_axis=NODE_AXIS)
        return _global_masked_loss(out, y, train_cfg, scaler_mean,
                                   scaler_std, axes)

    rep = P()
    bspec = P(DATA_AXIS, None, NODE_AXIS, None)  # (B, T, N, C)

    def step(params, opt_state, packs_arrays, x, y, y_cov, batches_seen,
             rng):
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, packs_arrays, x, y, y_cov, batches_seen, rng)
        grads = jax.lax.pmean(grads, axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    mapped = shard_map(step, mesh=mesh,
                       in_specs=(rep, rep, pspec, bspec, bspec, bspec, rep,
                                 rep),
                       out_specs=(rep, rep, rep), check_rep=False)
    donate_argnums = (0, 1) if donate else ()
    jitted = jax.jit(mapped, donate_argnums=donate_argnums)

    def run(params, opt_state, x, y, y_cov, batches_seen, rng):
        return jitted(params, opt_state, sharded_packs, x, y, y_cov,
                      batches_seen, rng)

    return run


def make_road_node_eval_forward(model_cfg: MegaCRNConfig, mesh: Mesh,
                                sharded_packs) -> Callable:
    """Eval forward for the node-partitioned road_sparse path: batch over
    ``data``, nodes over ``node``, per-device row-block packs. Outputs come
    back as global arrays (metrics run on them outside)."""
    from megacrn_tpu.kernels.spmm import ShardedRoadPacks, local_packs
    from megacrn_tpu.kernels.spmm_ell_node import (BucketedShardedNodeELL,
                                                   ShardedNodeELL,
                                                   local_node_ell)

    if isinstance(sharded_packs, (ShardedNodeELL, BucketedShardedNodeELL)):
        to_local = local_node_ell
        pspec = jax.tree_util.tree_map(lambda _: P(NODE_AXIS), sharded_packs)
    elif isinstance(sharded_packs, ShardedRoadPacks):
        to_local = local_packs
        pspec = ShardedRoadPacks(
            *(P(None, NODE_AXIS) for _ in range(6)),
            n_loc=sharded_packs.n_loc, n_full=sharded_packs.n_full)
    else:
        raise ValueError("sharded_packs must come from "
                         "kernels.spmm.shard_road_packs or "
                         "kernels.spmm_ell_node.shard_node_ell")

    def fwd(params, packs_arrays, x, y_cov):
        return megacrn.forward(params, x, y_cov, model_cfg,
                               road_supports=to_local(packs_arrays),
                               ring_axis=NODE_AXIS)

    rep = P()
    bspec = P(DATA_AXIS, None, NODE_AXIS, None)  # (B, T, N, C)
    nspec = P(DATA_AXIS, NODE_AXIS, None)  # (B, N, mem_dim)
    mapped = shard_map(
        fwd, mesh=mesh, in_specs=(rep, pspec, bspec, bspec),
        out_specs=megacrn.MegaCRNOutput(bspec, nspec, nspec, nspec, nspec),
        check_rep=False)
    jitted = jax.jit(mapped)

    def run(params, x, y_cov):
        return jitted(params, sharded_packs, x, y_cov)

    return run


def make_gts_mesh_train_step(
    cfg,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean,
    scaler_std,
    node_feas,
    knn_prior,
    donate: bool = True,
    gumbel_noise: bool = True,
) -> Callable:
    """Data-parallel GTS train step (shard_map over ``data``) — the second
    model family through the same explicit-collective layer.

    ``gumbel_noise=False`` (the deterministic-parity mode) is honored here
    exactly as in the single-device step, so mesh train and eval semantics
    stay consistent.

    Same global-masked-loss construction as ``make_shardmap_train_step``.
    GTS specifics that make DP exact without extra collectives:

    * The graph learner's BatchNorm consumes ``node_feas`` — the REPLICATED
      per-node training series (model/GTS.py:354-356) — not the batch, so
      every shard computes identical batch statistics and the returned
      ``bn_state`` is consistent by construction.
    * ``adj_prob``/BCE graph loss likewise derive only from replicated
      inputs; the Gumbel coins come from the replicated rng, so all shards
      sample the SAME graph (required: the graph is global state).
    """
    from megacrn_tpu.models import gts
    from megacrn_tpu.train.gts_loop import bce

    node_feas = jnp.asarray(node_feas)
    knn_prior = jnp.asarray(knn_prior).reshape(-1)

    def loss_fn(params, bn_state, x, y, batches_seen, rng):
        out = gts.forward(params, bn_state, x, node_feas, cfg, labels=y,
                          batches_seen=batches_seen, rng=rng, training=True,
                          gumbel_noise=gumbel_noise)
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        y_true = inverse_transform(y, scaler_std, scaler_mean)
        num, den = losses.masked_mae_sums(y_pred, y_true)
        num = jax.lax.psum(num, DATA_AXIS)
        den = jax.lax.psum(den, DATA_AXIS)
        pred_loss = num / jnp.maximum(den, 1.0)
        graph_loss = bce(out.adj_prob.reshape(-1), knn_prior)  # replicated
        return pred_loss + graph_loss, out.bn_state

    rep = P()
    bspec = P(DATA_AXIS)

    def step(params, bn_state, opt_state, x, y, batches_seen, rng):
        rng = jax.random.fold_in(rng, batches_seen.astype(jnp.int32))
        (loss, bn_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn_state, x, y, batches_seen, rng)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bn_state, opt_state, loss

    mapped = shard_map(step, mesh=mesh,
                       in_specs=(rep, rep, rep, bspec, bspec, rep, rep),
                       out_specs=(rep, rep, rep, rep), check_rep=False)
    donate_argnums = (0, 2) if donate else ()
    return jax.jit(mapped, donate_argnums=donate_argnums)


def make_megacrnx_mesh_train_step(
    model_cfg,
    train_cfg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    scaler_mean: float,
    scaler_std: float,
    donate: bool = True,
) -> Callable:
    """Data-parallel MegaCRNx train step (shard_map over ``data``) — the
    third model family through the explicit-collective layer.

    Same construction as ``make_shardmap_train_step``: the MaskMAE
    prediction loss psums its masked numerator/denominator over ``data``
    and divides once (exact global masked mean under uneven mask density,
    via ``losses.masked_mae_null_sums`` — the null_val=1e-3 flavor the
    MegaCRNx protocol uses, model_futurework/utils.py:98-109); the plain
    MAE flavor psums sum/count; aux memory losses are equal-shard means,
    pmean'd. The step is deterministic (no scheduled sampling in MegaCRNx)
    so no RNG threading is needed. Returns jitted ``(params, opt_state, x,
    y_raw, y_cov) -> (params, opt_state, (loss, l1, l2, l3))`` with the
    same signature as the single-device ``make_megacrnx_train_step``;
    batch must divide by the mesh ``data`` axis.
    """
    from megacrn_tpu.models import megacrnx

    def loss_fn(params, x, y, y_cov):
        out = megacrnx.forward(params, x, y_cov, model_cfg)
        y_pred = inverse_transform(out.output, scaler_std, scaler_mean)
        if train_cfg.loss == "MaskMAE":
            num, den = losses.masked_mae_null_sums(y_pred, y, null_val=1e-3)
            num = jax.lax.psum(num, DATA_AXIS)
            den = jax.lax.psum(den, DATA_AXIS)
            l1 = num / jnp.maximum(den, 1.0)
        elif train_cfg.loss == "MAE":
            err = jnp.abs(y_pred - y)
            total = jax.lax.psum(jnp.sum(err), DATA_AXIS)
            count = jax.lax.psum(jnp.asarray(err.size, err.dtype), DATA_AXIS)
            l1 = total / count
        else:
            raise ValueError(f"unknown loss {train_cfg.loss!r}")
        if out.query is None:  # memory_type=False ablation
            zero = jnp.zeros((), y_pred.dtype)
            l2 = l3 = zero
        else:
            pos = jax.lax.stop_gradient(out.pos)
            neg = jax.lax.stop_gradient(out.neg)
            l2 = jax.lax.pmean(
                losses.triplet_margin_loss(out.query, pos, neg, margin=1.0),
                DATA_AXIS)
            l3 = jax.lax.pmean(losses.mse(out.query, pos), DATA_AXIS)
        total = l1 + train_cfg.lamb * l2 + train_cfg.lamb1 * l3
        return total, (l1, l2, l3)

    rep = P()
    bspec = P(DATA_AXIS)

    def step(params, opt_state, x, y, y_cov):
        (total, (l1, l2, l3)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, y, y_cov)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (total, l1, l2, l3)

    mapped = shard_map(step, mesh=mesh,
                       in_specs=(rep, rep, bspec, bspec, bspec),
                       out_specs=(rep, rep, (rep, rep, rep, rep)),
                       check_rep=False)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(mapped, donate_argnums=donate_argnums)


def make_shardmap_eval_forward(model_cfg: MegaCRNConfig, mesh: Mesh,
                               road_supports=None) -> Callable:
    """Data-parallel eval forward via shard_map (any backend incl. Pallas)."""
    skel, sup_arrays = split_support_arrays(road_supports)

    def fwd(params, x, y_cov, sup):
        return megacrn.forward(
            params, x, y_cov, model_cfg,
            road_supports=join_support_arrays(skel, sup))

    rep = P()
    bspec = P(DATA_AXIS)
    sup_spec = jax.tree_util.tree_map(lambda _: rep, sup_arrays)
    mapped = shard_map(
        fwd, mesh=mesh, in_specs=(rep, bspec, bspec, sup_spec),
        out_specs=megacrn.MegaCRNOutput(bspec, bspec, bspec, bspec, bspec),
        check_rep=False)
    jitted = jax.jit(mapped)

    def run(params, x, y_cov):
        return jitted(params, x, y_cov, sup_arrays)

    return run
