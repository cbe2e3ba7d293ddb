"""Training harness: the full reference protocol as a library function.

Implements the canonical train->early-stop->reload-best->test program
(``model/traintest_MegaCRN.py:101-155``): epoch loop with a global
``batches_seen`` counter driving curriculum decay, per-epoch val (and test)
evaluation, best-val checkpointing, patience-based early stop, and final
best-checkpoint test. Differences from the reference are capability adds:
full restartable checkpoints (optimizer/RNG/counter state) and optional
per-epoch reshuffling.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from megacrn_tpu.config import MegaCRNConfig, TrainConfig
from megacrn_tpu.data.loader import BatchLoader, prepare_x_y
from megacrn_tpu.models import megacrn
from megacrn_tpu.train import checkpoint as ckpt
from megacrn_tpu.train.logs import RunDir, echo_hparams
from megacrn_tpu.train.optim import make_optimizer
from megacrn_tpu.train.steps import (make_eval_step, make_train_step,
                                     summarize_eval)


def _reinit_xavier_uniform(params, key):
    """EXPY-TKY harness second init pass
    (model_EXPYTKY/traintest_MegaCRN.py:27-35): xavier_uniform on params with
    dim > 1, U(0,1) on 1-D params."""
    from megacrn_tpu.nn.init import xavier_uniform

    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for leaf, k in zip(leaves, keys):
        if leaf.ndim > 1:
            new_leaves.append(xavier_uniform(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(jax.random.uniform(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _log_compiled_memory(run, train_step, params, opt_state, x0, y0, y_cov,
                         batches_seen, rng):
    """Best-effort, once per run: AOT-lower the already-compiled train step
    at the live shapes and record its memory analysis (argument/temp/output
    bytes) in metrics.jsonl. The persistent compilation cache dedups this
    with the executing jit on TPU. Steps wrapped in Python closures that
    don't expose a ``_jitted`` handle are skipped silently — observability
    must never kill a run."""
    from megacrn_tpu.train import telemetry as tele

    jitted = getattr(train_step, "_jitted", None)
    extra = getattr(train_step, "_extra_args", ())
    if jitted is None and hasattr(train_step, "lower"):
        jitted, extra = train_step, ()
    if jitted is None:
        return
    # The AOT lower+compile does NOT share the jit's in-process executable
    # cache — only the persistent compilation cache dedups it. On CPU the
    # duplicate compile is cheap; on an accelerator without a persistent
    # cache configured (library callers outside the CLI/bench), skip
    # rather than silently doubling a 10-30 s (or minutes-long remote)
    # compile for byte-size telemetry.
    if (jax.default_backend() != "cpu"
            and not getattr(jax.config, "jax_compilation_cache_dir", None)):
        return
    try:
        compiled = jitted.lower(params, opt_state, x0, y0, y_cov,
                                jnp.float32(batches_seen), rng,
                                *extra).compile()
        run.log_metrics(
            {"compiled_memory": tele.compiled_memory_stats(compiled)})
    except Exception:  # noqa: BLE001
        pass


def evaluate(eval_step, loader: BatchLoader, model_cfg: MegaCRNConfig,
             input_dim: int, output_dim: int) -> Dict[str, float]:
    device_metrics = []
    batch_metrics = []
    for x, y in loader:
        x0, y0, y_cov = prepare_x_y(x, y, input_dim, output_dim)
        device_metrics.append(eval_step(x0, y0, y_cov))
        # Drain in blocks of 10: one host transfer per block amortizes the
        # tunnel round-trip ~10x vs a per-batch device_get, while still
        # bounding the dispatch queue (deep unsynced queues wedge the axon
        # tunnel — CLAUDE.md).
        if len(device_metrics) >= 10:
            batch_metrics.extend(jax.device_get(device_metrics))
            device_metrics.clear()
    batch_metrics.extend(jax.device_get(device_metrics))
    return summarize_eval(batch_metrics, model_cfg.horizon)


def fit(
    model_cfg: MegaCRNConfig,
    train_cfg: TrainConfig,
    data: Dict,
    run: RunDir,
    *,
    test_every_epoch: bool = True,
    resume: bool = False,
    max_epochs: Optional[int] = None,
    final_eval_fn=None,
    mesh=None,
    ckpt_backend: str = "npz",
    road_supports=None,
    initial_params=None,
    profile_dir: Optional[str] = None,
    profile_steps: int = 10,
    log_compiled_memory: bool = True,
) -> Dict:
    """Train MegaCRN with the reference protocol.

    ``data`` keys: train_loader / val_loader / test_loader (BatchLoader),
    scaler_mean, scaler_std (scalars or broadcastable arrays).
    ``mesh``: optional jax.sharding.Mesh — trains data-parallel +
    node-partitioned over it (megacrn_tpu.parallel).
    ``ckpt_backend``: 'npz' (single-file atomic) or 'orbax' (directory
    format, distributed shard writes on multi-host meshes).
    ``road_supports``: sparse-backend graph constant (BlockELL packs for
    graph_backend='road_sparse', BlockPattern for 'sparse_meta'); on a mesh
    the Pallas road_sparse backend trains through the explicit shard_map
    data-parallel step (GSPMD cannot partition a custom call), the other
    backends through the GSPMD step.
    ``profile_dir``: capture a jax.profiler trace (TensorBoard/xprof
    format) of ``profile_steps`` steady-state steps of the first epoch
    (the compile step is excluded). ``log_compiled_memory``: record the
    compiled train step's argument/temp/output byte sizes in metrics.jsonl
    after the first compile (SURVEY.md section 5 tracing/profiling row).
    Returns {params, best_val, test_metrics, epochs_run}.
    """
    if ckpt_backend not in ("npz", "orbax"):
        raise ValueError(f"unknown ckpt_backend {ckpt_backend!r}")
    save_ckpt = (ckpt.save_checkpoint if ckpt_backend == "npz"
                 else ckpt.save_checkpoint_orbax)
    logger = run.get_logger()
    echo_hparams(logger, model=model_cfg, train=train_cfg)

    seed = train_cfg.seed if train_cfg.seed is not None else int(time.time())
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reinit = jax.random.split(key, 3)
    params = megacrn.init_params(k_init, model_cfg)
    if train_cfg.reinit_xavier_uniform:
        params = _reinit_xavier_uniform(params, k_reinit)
    if initial_params is not None:
        # Injected start point (e.g. converted from a reference torch
        # state_dict for train-to-train parity runs, megacrn_tpu.interop).
        params = jax.tree_util.tree_map(jnp.asarray, initial_params)
    logger.info("param_count", megacrn.param_count(params))

    steps_per_epoch = len(data["train_loader"])
    optimizer = make_optimizer(train_cfg, steps_per_epoch)
    opt_state = optimizer.init(params)

    mean, std = data.get("scaler_mean", 0.0), data.get("scaler_std", 1.0)
    if mesh is not None:
        from megacrn_tpu.parallel.api import (make_ring_train_step,
                                              make_sharded_train_step,
                                              make_shardmap_train_step)
        from megacrn_tpu.parallel.mesh import shard_batch, shard_params

        if model_cfg.graph_backend == "dense_ring":
            # Explicit-collective node partition: the whole train step runs
            # in shard_map with ring ppermute aggregation; params replicated.
            train_step = make_ring_train_step(
                model_cfg, train_cfg, optimizer, mesh, mean, std)
            place_batch = lambda arrays: shard_batch(arrays, mesh)
        elif model_cfg.graph_backend == "road_sparse":
            from megacrn_tpu.kernels.spmm import ShardedRoadPacks
            from megacrn_tpu.kernels.spmm_ell_node import (
                BucketedShardedNodeELL, ShardedNodeELL)

            if isinstance(road_supports, (ShardedRoadPacks, ShardedNodeELL,
                                          BucketedShardedNodeELL)):
                # Node-partitioned + DP: per-device row-block packs, x
                # gathered over the node axis inside shard_map.
                from megacrn_tpu.parallel.api import make_road_node_train_step

                train_step = make_road_node_train_step(
                    model_cfg, train_cfg, optimizer, mesh, road_supports,
                    mean, std)
                place_batch = lambda arrays: shard_batch(arrays, mesh)
            else:
                # Pallas custom call: explicit DP shard_map, replicated
                # params and graph.
                from jax.sharding import NamedSharding, PartitionSpec as P

                train_step = make_shardmap_train_step(
                    model_cfg, train_cfg, optimizer, mesh, mean, std,
                    road_supports=road_supports)
                dp = NamedSharding(mesh, P("data"))
                place_batch = lambda arrays: jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, dp), arrays)
        else:
            params = shard_params(params, mesh)
            opt_state = optimizer.init(params)
            train_step = make_sharded_train_step(
                model_cfg, train_cfg, optimizer, mesh, mean, std,
                road_supports=road_supports)
            place_batch = lambda arrays: shard_batch(arrays, mesh)
    else:
        train_step = make_train_step(model_cfg, train_cfg, optimizer,
                                     mean, std, road_supports=road_supports,
                                     donate=True)
        place_batch = lambda arrays: arrays
    if mesh is not None:
        # Mesh eval is data-parallel for EVERY backend: the shard_map
        # backends (Pallas road_sparse / dense_ring / node-partitioned
        # packs) forward through their explicit shard_map eval programs;
        # the GSPMD backends (dense, sparse_meta) through the
        # constraint-pinned forward with batches placed by shard_batch
        # (round-4 VERDICT weak item 4). Metrics run jitted on the
        # outputs either way.
        from megacrn_tpu.train.steps import _metric_steps, eval_metrics

        if model_cfg.graph_backend in ("road_sparse", "dense_ring"):
            from megacrn_tpu.kernels.spmm import ShardedRoadPacks
            from megacrn_tpu.kernels.spmm_ell_node import (
                BucketedShardedNodeELL, ShardedNodeELL)
            from megacrn_tpu.parallel.api import (
                make_road_node_eval_forward, make_shardmap_eval_forward)

            if isinstance(road_supports, (ShardedRoadPacks, ShardedNodeELL,
                                          BucketedShardedNodeELL)):
                eval_fwd = make_road_node_eval_forward(model_cfg, mesh,
                                                       road_supports)
            else:
                eval_fwd = make_shardmap_eval_forward(
                    model_cfg, mesh, road_supports=road_supports)
        else:
            from megacrn_tpu.parallel.api import make_sharded_eval_forward

            eval_fwd = make_sharded_eval_forward(
                model_cfg, mesh, road_supports=road_supports)
        msteps = _metric_steps(model_cfg.horizon)
        metrics_fn = jax.jit(lambda out, y: eval_metrics(
            out, y, train_cfg, mean, std, msteps))

        def eval_step(x0, y0, y_cov):
            x0s, ycs = place_batch((x0, y_cov))
            return metrics_fn(eval_fwd(params, x0s, ycs), y0)
    else:
        eval_raw = make_eval_step(model_cfg, train_cfg, mean, std,
                                  road_supports=road_supports)

        def eval_step(x0, y0, y_cov):
            return eval_raw(params, x0, y0, y_cov)

    batches_seen = 0
    start_epoch = 0
    min_val_loss = float("inf")
    wait = 0
    if resume:
        import os

        if os.path.exists(run.checkpoint_path):
            # Capture the live placements BEFORE loading: on a mesh the
            # params/opt_state built above are already mesh-placed (GSPMD
            # branch: shard_params at construction), while load_checkpoint
            # returns host arrays — re-placing with the captured shardings
            # makes a resumed mesh run identical to an uninterrupted one.
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                repl = NamedSharding(mesh, PartitionSpec())

                def _sh(a):
                    # Mesh-placed leaves keep their NamedSharding; leaves the
                    # construction left uncommitted (e.g. optimizer counters)
                    # become replicated — committing them back to a single
                    # device would conflict with the mesh-sharded params.
                    s = getattr(a, "sharding", None)
                    return s if isinstance(s, NamedSharding) else repl

                param_sh = jax.tree_util.tree_map(_sh, params)
                opt_sh = jax.tree_util.tree_map(_sh, opt_state)
            params, opt_state, meta = ckpt.load_checkpoint(
                run.checkpoint_path, params, opt_state)
            if mesh is not None:
                params = jax.device_put(params, param_sh)
                opt_state = jax.device_put(opt_state, opt_sh)
            batches_seen = meta.get("batches_seen", 0)
            start_epoch = meta.get("epoch", 0) + 1
            min_val_loss = meta.get("best_val", float("inf"))
            if "rng_key" in meta:
                # The live key, so the resumed epoch's split chain is
                # identical to the uninterrupted run's.
                key = jnp.asarray(meta["rng_key"])
            else:  # legacy checkpoints
                key = jax.random.PRNGKey(meta.get("rng_seed", seed + 1))
            if "scaler_mean_arr" in meta:
                mean = np.asarray(meta["scaler_mean_arr"])
                std = np.asarray(meta["scaler_std_arr"])
            logger.info("resumed from", run.checkpoint_path, "epoch", start_epoch)

    # Per-epoch throughput accounting (telemetry.StepTimer's edges/s
    # derivation, amortized at epoch granularity so no per-step host sync
    # is added on the stall-prone tunnel). The analytic edge count covers
    # the dense backends; sparse backends report steps/s only (bench.py
    # carries their nnz-exact accounting).
    from megacrn_tpu.train import telemetry as tele

    edges_per_step = None
    if model_cfg.graph_backend in ("dense", "dense_ring"):
        edges_per_step = tele.edge_traversals_per_step(
            model_cfg.num_nodes, model_cfg.cheb_k, model_cfg.seq_len,
            model_cfg.horizon, train_cfg.batch_size, model_cfg.num_supports)
    elif road_supports is not None:
        # Sparse backends: each backend's OWN stored edge count when the
        # pack exposes it (the stacked node-ELL families); other pack
        # layouts report steps/s only.
        try:
            from megacrn_tpu.kernels.spmm_ell_node import pack_nnz

            edges_per_step = tele.edge_traversals_per_step(
                model_cfg.num_nodes, model_cfg.cheb_k, model_cfg.seq_len,
                model_cfg.horizon, train_cfg.batch_size,
                model_cfg.num_supports, nnz=pack_nnz(road_supports))
        except (TypeError, AttributeError):
            pass
    mem_logged = not log_compiled_memory
    profile_pending = profile_dir is not None
    profile_steps = max(1, profile_steps)  # 0/negative would never stop
    profile_active = False
    first_step_done = False  # first step of the RUN carries the compile

    epochs = max_epochs if max_epochs is not None else train_cfg.epochs
    epochs_run = 0
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        t_steady = t0  # moved past the compile after the run's first step
        steady_offset = 0  # steps excluded from throughput accounting
        step_in_epoch = 0
        train_losses = []
        key, k_epoch = jax.random.split(key)  # one host RNG op per EPOCH;
        # per-step keys are folded in on-device inside train_step
        if hasattr(data["train_loader"], "set_epoch"):
            data["train_loader"].set_epoch(epoch)
        for x, y in data["train_loader"]:
            x0, y0, y_cov = place_batch(prepare_x_y(
                x, y, model_cfg.input_dim, model_cfg.output_dim))
            params, opt_state, loss = train_step(
                params, opt_state, x0, y0, y_cov,
                jnp.float32(batches_seen), k_epoch)
            train_losses.append(loss)
            batches_seen += 1
            step_in_epoch += 1
            if not first_step_done:
                # Exclude the one-time jit compile (and the AOT
                # memory-stats lower below) from the first epoch's
                # throughput accounting: sync, then restart the clock.
                first_step_done = True
                float(loss)
                if not mem_logged:
                    mem_logged = True
                    _log_compiled_memory(run, train_step, params, opt_state,
                                         x0, y0, y_cov, batches_seen,
                                         k_epoch)
                t_steady = time.time()
                steady_offset = step_in_epoch
            if profile_pending and not profile_active and step_in_epoch == 1:
                # Steady-state trace window: the first step (compile +
                # warmup) completes before the trace starts.
                float(loss)
                jax.profiler.start_trace(profile_dir)
                profile_active = True
            elif profile_active and step_in_epoch == 1 + profile_steps:
                float(loss)  # drain so the trace contains the real work
                jax.profiler.stop_trace()
                profile_active = False
                profile_pending = False
            if batches_seen % 10 == 0:
                # Periodic host sync: bounds the async dispatch queue (the
                # axon TPU tunnel wedges on deep unsynced queues) at
                # negligible amortized cost.
                float(loss)
        train_loss = float(np.mean([float(l) for l in train_losses]))
        # Steady-state train time: the clock restarts after the run's first
        # (compile-carrying) step, so epoch-1 throughput is not understated
        # by jit/AOT compile time. The float() drain above synced.
        train_dt = time.time() - t_steady
        steady_steps = step_in_epoch - steady_offset
        if profile_active:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            profile_active = False
            profile_pending = False

        val = evaluate(eval_step, data["val_loader"], model_cfg,
                       model_cfg.input_dim, model_cfg.output_dim)
        dt = time.time() - t0
        msg = (f"Epoch [{epoch + 1}/{epochs}] ({batches_seen}) "
               f"train_loss: {train_loss:.4f}, val_loss: {val['loss']:.4f}, "
               f"{dt:.1f}s")
        logger.info(msg)
        run.append_epochlog(msg)
        throughput = {}
        if steady_steps > 0:
            sec_per_step = train_dt / steady_steps
            throughput = {"sec_per_step": sec_per_step,
                          "steps_per_sec": 1.0 / sec_per_step}
            if edges_per_step is not None:
                throughput["edges_per_sec"] = edges_per_step / sec_per_step
        run.log_metrics({"epoch": epoch + 1, "train_loss": train_loss,
                         "val": val, "seconds": dt, **throughput})

        if test_every_epoch:
            test = evaluate(eval_step, data["test_loader"], model_cfg,
                            model_cfg.input_dim, model_cfg.output_dim)
            run.log_metrics({"epoch": epoch + 1, "test": test})

        epochs_run = epoch + 1
        if val["loss"] < min_val_loss:
            wait = 0
            min_val_loss = val["loss"]
            save_ckpt(
                run.checkpoint_path, params, opt_state,
                metadata={"epoch": epoch, "batches_seen": batches_seen,
                          "best_val": min_val_loss,
                          "scaler_mean": float(np.mean(mean)),
                          "scaler_std": float(np.mean(std))},
                # Lossless state JSON can't carry: the live PRNG key (the
                # post-split key for epoch+1) and the full per-column scaler
                # stats (EXPY-TKY fits one mean/std per road).
                arrays={"rng_key": np.asarray(key),
                        "scaler_mean_arr": np.asarray(mean),
                        "scaler_std_arr": np.asarray(std)})
        else:
            wait += 1
            if wait == train_cfg.patience:
                logger.info("Early stopping at epoch:", epoch)
                break

    # Reload best checkpoint, final test (model/traintest_MegaCRN.py:152-155).
    params, _, _ = ckpt.load_checkpoint(run.checkpoint_path, params)
    if final_eval_fn is not None:
        # Dataset-specific protocol (e.g. EXPY-TKY numpy metrics,
        # model_EXPYTKY/traintest_MegaCRN.py:123-148).
        test = final_eval_fn(params)
    else:
        test = evaluate(eval_step, data["test_loader"], model_cfg,
                        model_cfg.input_dim, model_cfg.output_dim)
    logger.info("Best model horizon overall: mae:", f"{test['mae']:.4f}",
                "mape:", f"{test['mape']:.4f}", "rmse:", f"{test['rmse']:.4f}")
    # One score line per horizon step present in the metrics: the canonical
    # protocol computes steps 3/6/12 (model/traintest_MegaCRN.py:96-98), the
    # EXPY-TKY per-step eval computes every step 1..horizon and the reference
    # writes each to the scores file (model_EXPYTKY/traintest_MegaCRN.py:146-149).
    for s in sorted({int(k.rsplit("_", 1)[1]) for k in test
                     if k.startswith("mae_")}):
        line = (f"Horizon {s}: mae: {test[f'mae_{s}']:.4f}, "
                f"mape: {test[f'mape_{s}']:.4f}, "
                f"rmse: {test[f'rmse_{s}']:.4f}")
        logger.info(line)
        run.append_scores(line)
    run.log_metrics({"final_test": test, "best_val": min_val_loss})
    return {"params": params, "best_val": min_val_loss,
            "test_metrics": test, "epochs_run": epochs_run}
