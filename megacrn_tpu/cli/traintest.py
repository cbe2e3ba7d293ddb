"""CLI: train + test MegaCRN, reproducing the reference flag surface.

Usage (mirrors ``python traintest_MegaCRN.py --dataset=METRLA --gpu=0``,
``README.md:53-65`` — the device flag is replaced by JAX device/mesh flags):

    python -m megacrn_tpu.cli.traintest --dataset METRLA --data_dir METRLA
    python -m megacrn_tpu.cli.traintest --dataset SYNTH --num_nodes 64

Every reference knob (model/traintest_MegaCRN.py:158-187) is exposed; dataset
presets hard-set num_nodes exactly as the reference does (:190-195).
"""
from __future__ import annotations

import argparse

from megacrn_tpu.config import (DATASETS, model_config_for, train_config_for)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="METRLA",
                   choices=list(DATASETS) + ["SYNTH"])
    p.add_argument("--data_dir", type=str, default=None,
                   help="dir with {train,val,test}.npz (npz pipeline)")
    p.add_argument("--save_dir", type=str, default="save")
    # model
    p.add_argument("--num_nodes", type=int, default=None)
    p.add_argument("--seq_len", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--input_dim", type=int, default=1)
    p.add_argument("--output_dim", type=int, default=1)
    p.add_argument("--max_diffusion_step", type=int, default=3, dest="cheb_k")
    p.add_argument("--num_rnn_layers", type=int, default=1, dest="num_layers")
    p.add_argument("--rnn_units", type=int, default=None)
    p.add_argument("--mem_num", type=int, default=None)
    p.add_argument("--mem_dim", type=int, default=None)
    p.add_argument("--use_curriculum_learning", type=lambda s: s == "True",
                   default=True)
    p.add_argument("--cl_decay_steps", type=int, default=2000)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--graph_backend", type=str, default="dense",
                   choices=["dense", "road_sparse", "sparse_meta",
                            "dense_ring"],
                   help="graph aggregation backend: dense XLA einsum "
                        "(parity), Pallas block-ELL SpMM over the static "
                        "road graph, learned block-sparse meta-graph, or "
                        "dense with explicit ring collectives on a mesh")
    p.add_argument("--adj_path", type=str, default=None,
                   help=".npy 0/1 road adjacency (expy-tky_adj01.npy "
                        "semantics, model_EXPYTKY/traintest_MegaCRN.py:"
                        "187-188); required by the sparse backends unless "
                        "running on SYNTH (which generates one)")
    p.add_argument("--road_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "ell"],
                   help="road_sparse SpMM execution strategy: 'ell' "
                        "(bucketed node-level gather ELL with unrolled "
                        "small-D reduction — the fastest sparse impl at "
                        "every measured size, beats dense from N~4096, "
                        "only impl that fits N=32768), 'pallas' "
                        "(streaming Mosaic tile kernel; ~90 s remote "
                        "compile), 'xla' (gather-einsum-scatter tile "
                        "chain); 'auto' = ell (measured policy, STATUS.md "
                        "perf tables)")
    p.add_argument("--sparse_meta_impl", type=str, default="node",
                   choices=["node", "block"],
                   help="sparse_meta granularity: 'node' (row-padded ELL "
                        "slots, O(nnz) pattern bytes, trains at N=1843 B=64 "
                        "without --remat) or 'block' (128x128 tiles — the "
                        "MXU-batched form, needs --remat at scale)")
    p.add_argument("--dense_impl", type=str, default="recursive",
                   choices=["stacked", "recursive"],
                   help="dense aggregation: 'recursive' (default, measured "
                        "faster - independent per-support matmul streams) "
                        "or 'stacked' (one tall matmul per aggregation, "
                        "measured 25% slower at N=1843)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize cell steps in the backward pass "
                        "(trade FLOPs for HBM)")
    # train
    p.add_argument("--lamb", type=float, default=None)
    p.add_argument("--lamb1", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--steps", type=eval, default=None,
                   help="lr milestone epochs, e.g. [50,100]")
    p.add_argument("--lr_decay_ratio", type=float, default=None)
    p.add_argument("--epsilon", type=float, default=None)
    p.add_argument("--max_grad_norm", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--test_every_epoch", type=lambda s: s == "True",
                   default=True)
    p.add_argument("--reshuffle_each_epoch", action="store_true",
                   help="per-epoch shuffle (off = reference parity: one "
                        "construction-time permutation)")
    p.add_argument("--eval_aggregation", type=str, default="per_batch",
                   choices=["per_batch", "concat"],
                   help="'per_batch' reproduces README numbers; 'concat' is "
                        "the traintestv1 full-concat-and-trim flavor")
    # synthetic source
    p.add_argument("--synth_steps", type=int, default=4000)
    # mesh
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_node", type=int, default=1)
    p.add_argument("--ckpt_backend", type=str, default="npz",
                   choices=["npz", "orbax"])
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of --profile_steps "
                        "steady-state steps of the first epoch into this "
                        "directory (TensorBoard/xprof format)")
    p.add_argument("--profile_steps", type=int, default=10)
    return p


def configs_from_args(args):
    ds = "METRLA" if args.dataset == "SYNTH" else args.dataset
    model_over = {}
    for f in ["num_nodes", "seq_len", "horizon", "rnn_units", "mem_num",
              "mem_dim"]:
        if getattr(args, f) is not None:
            model_over[f] = getattr(args, f)
    model_over.update(
        input_dim=args.input_dim, output_dim=args.output_dim,
        cheb_k=args.cheb_k, num_layers=args.num_layers,
        cl_decay_steps=args.cl_decay_steps,
        use_curriculum_learning=args.use_curriculum_learning,
        compute_dtype=args.compute_dtype,
        graph_backend=args.graph_backend, dense_impl=args.dense_impl,
        remat=args.remat)
    model_cfg = model_config_for(ds, **model_over)

    train_over = {}
    mapping = {"lamb": "lamb", "lamb1": "lamb1", "epochs": "epochs",
               "patience": "patience", "batch_size": "batch_size",
               "lr": "lr", "lr_decay_ratio": "lr_decay_ratio",
               "epsilon": "epsilon", "seed": "seed"}
    for arg_name, cfg_name in mapping.items():
        if getattr(args, arg_name) is not None:
            train_over[cfg_name] = getattr(args, arg_name)
    if args.steps is not None:
        train_over["lr_milestones"] = tuple(args.steps)
    if args.max_grad_norm is not None:
        train_over["max_grad_norm"] = args.max_grad_norm
    train_cfg = train_config_for(ds, **train_over)
    return model_cfg, train_cfg


def _load_expytky_data(args, model_cfg, train_cfg):
    """EXPY-TKY source: monthly CSVs from --data_dir in the reference layout
    (params.txt semantics), or the synthetic stand-in when absent."""
    import os

    import numpy as np

    from megacrn_tpu.data import datasets, expytky

    if args.data_dir and os.path.isdir(args.data_dir):
        n_all = 2841
        sub_name = ("tokyoall_link_idx.csv" if args.dataset == "EXPYTKY_ALL"
                    else "tokyo_link_idx.csv")
        sub_path = os.path.join(args.data_dir, sub_name)
        sub_idx = (np.loadtxt(sub_path).astype(int)
                   if os.path.exists(sub_path) else None)

        def month(ym):
            path = os.path.join(args.data_dir, f"expy-tky_{ym}.csv.gz")
            speed = expytky.load_speed_csv(path, n_all, sub_idx)
            time = expytky.load_time_csv(path, n_all, sub_idx)
            return np.concatenate([speed, time], axis=-1).astype(np.float32)

        train_months = [month("202110"), month("202111")]
        test_months = [month("202112")]
        return datasets.build_expytky(
            train_months, test_months, model_cfg.seq_len, model_cfg.horizon,
            train_cfg.batch_size, val_ratio=train_cfg.val_ratio,
            shuffle_seed=train_cfg.seed)
    return datasets.build_expytky_synthetic(
        num_nodes=model_cfg.num_nodes, his_len=model_cfg.seq_len,
        seq_len=model_cfg.horizon, batch_size=train_cfg.batch_size,
        val_ratio=train_cfg.val_ratio, shuffle_seed=train_cfg.seed)


def build_road_supports(args, model_cfg):
    """Wire the road adjacency into the chosen sparse backend's graph
    constant: ``--adj_path`` (expy-tky_adj01.npy semantics) or a synthetic
    stand-in -> dual-random-walk supports -> BlockELL packs (road_sparse) /
    edge BlockPattern (sparse_meta). Returns ``(fit_supports,
    eval_supports)`` — identical except with ``--mesh_node > 1`` on the
    road_sparse backend, where fit gets node-partitioned ShardedRoadPacks
    and the single-device final evals keep the plain packs. ``(None, None)``
    for the dense backends."""
    if model_cfg.graph_backend not in ("road_sparse", "sparse_meta"):
        return None, None
    import os

    import numpy as np

    from megacrn_tpu.data import expytky

    if args.adj_path:
        sub_idx = None
        if args.data_dir and os.path.isdir(args.data_dir):
            sub_name = ("tokyoall_link_idx.csv"
                        if args.dataset == "EXPYTKY_ALL"
                        else "tokyo_link_idx.csv")
            sub_path = os.path.join(args.data_dir, sub_name)
            if os.path.exists(sub_path) and args.dataset.startswith("EXPYTKY"):
                sub_idx = np.loadtxt(sub_path).astype(int)
        adj = expytky.load_adjacency(args.adj_path, sub_idx)
        if adj.shape[0] != model_cfg.num_nodes:
            raise SystemExit(
                f"adjacency is {adj.shape[0]} nodes, model expects "
                f"{model_cfg.num_nodes}")
    else:
        if args.dataset != "SYNTH":
            raise SystemExit(
                f"--graph_backend={model_cfg.graph_backend} requires "
                "--adj_path (or --dataset SYNTH for a generated graph)")
        from megacrn_tpu.data.synthetic import synthetic_road_adjacency

        adj = synthetic_road_adjacency(model_cfg.num_nodes, avg_degree=8,
                                       seed=0)

    if model_cfg.graph_backend == "road_sparse":
        from megacrn_tpu.kernels.spmm import shard_road_packs
        from megacrn_tpu.kernels.spmm_coo import build_stacked_road_pack
        from megacrn_tpu.ops.graph import dual_random_walk_supports

        s1, s2 = dual_random_walk_supports(adj)
        # Node-level ELL (gather-based, the scalable form for ultra-sparse
        # graphs) or the block-diagonal COO pack (tile-granular Mosaic/XLA
        # kernels) — the choice applies to single-device, DP, and the
        # node-partitioned mesh path alike.
        impl = getattr(args, "road_impl", "auto")
        if impl == "auto":
            # TPU-measured policy (round-5 unrolled-gather remeasurement,
            # STATUS.md perf tables): with the unrolled small-D gather the
            # bucketed node-ELL is the fastest sparse impl at EVERY size —
            # N=1843 B64 122.0 ms vs Mosaic tiles 167.3 (a 89 s Mosaic
            # compile vs seconds of XLA), N=2841 206.7 vs 345.9, beats
            # dense from N=4096 up (121.5 vs 140.7 at 4096 B32, 1.80x at
            # 8192, 3.0x at 16384) and is the only backend that fits
            # N=32768. The tile kernels stay reachable explicitly
            # (--road_impl xla/pallas) as the measured A/B.
            impl = "ell"
        if impl == "ell":
            from megacrn_tpu.kernels.spmm_ell_node import \
                build_stacked_node_ell

            stacked = build_stacked_node_ell([s1, s2])
        else:
            stacked = build_stacked_road_pack([s1, s2], impl=impl)
        if getattr(args, "mesh_node", 1) > 1:
            # Node-partitioned packs for fit: each device owns its row
            # block (parallel.api.make_road_node_train_step accepts both
            # families); the single-device final evals keep the plain pack.
            if impl == "ell":
                from megacrn_tpu.kernels.spmm_ell_node import shard_node_ell

                return shard_node_ell([s1, s2], args.mesh_node), stacked
            return shard_road_packs([s1, s2], args.mesh_node), stacked
        return stacked, stacked
    # sparse_meta: learned meta-graph restricted to the symmetrised edge
    # pattern (+ self loops, so every row has at least one edge).
    pat = ((adj != 0) | (adj.T != 0)).astype(np.float32)
    np.fill_diagonal(pat, 1.0)
    if getattr(args, "sparse_meta_impl", "node") == "node":
        from megacrn_tpu.kernels.sparse_graph_node import build_node_pattern

        pattern = build_node_pattern(pat)
    else:
        from megacrn_tpu.kernels.sparse_graph import build_block_pattern

        pattern = build_block_pattern(pat)
    return pattern, pattern


def _make_concat_final_eval(model_cfg, data, road_supports=None):
    """traintestv1 flavor (model/traintestv1_MegaCRN.py:54-92): global
    metrics over concatenated, pad-trimmed, inverse-transformed preds."""
    import functools

    import jax

    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.eval_modes import eval_concat

    def final_eval(params):
        fwd = jax.jit(functools.partial(megacrn.forward, cfg=model_cfg,
                                        road_supports=road_supports))

        def predict(x0, y_cov):
            return fwd(params, x0, y_cov).output

        return eval_concat(predict, data["test_loader"], model_cfg.input_dim,
                           model_cfg.output_dim, data["scaler_mean"],
                           data["scaler_std"])

    return final_eval


def _make_expytky_final_eval(model_cfg, data, road_supports=None):
    import functools

    import jax

    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.eval_modes import eval_expytky

    def final_eval(params):
        fwd = jax.jit(functools.partial(megacrn.forward, cfg=model_cfg,
                                        road_supports=road_supports))

        def predict(x0, y_cov):
            return fwd(params, x0, y_cov).output

        return eval_expytky(predict, data["test_loader"],
                            model_cfg.input_dim, model_cfg.output_dim,
                            data["scaler"])

    return final_eval


def _enable_compile_cache():
    """Persistent XLA/Mosaic compilation cache: the road_sparse Mosaic
    kernel costs a multi-minute remote compile at EXPY-TKY scale (~1000 s at
    N=2841) — cache it so re-runs/resumes start hot."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("MEGACRN_COMPILE_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".megacrn_jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob


def main(argv=None):
    args = build_parser().parse_args(argv)
    model_cfg, train_cfg = configs_from_args(args)
    _enable_compile_cache()

    from megacrn_tpu.data import datasets
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    # Fail fast on a missing adjacency before any data loading.
    road_supports, eval_supports = build_road_supports(args, model_cfg)

    final_eval_fn = None
    if args.dataset == "SYNTH":
        data = datasets.build_synthetic(
            num_nodes=model_cfg.num_nodes, num_steps=args.synth_steps,
            seq_len=model_cfg.seq_len, horizon=model_cfg.horizon,
            batch_size=train_cfg.batch_size,
            reshuffle_each_epoch=args.reshuffle_each_epoch,
            shuffle_seed=train_cfg.seed)
    elif args.dataset.startswith("EXPYTKY"):
        data = _load_expytky_data(args, model_cfg, train_cfg)
    else:
        if args.data_dir is None:
            raise SystemExit(f"--data_dir required for dataset {args.dataset}")
        data = datasets.load_npz_splits(
            args.data_dir, train_cfg.batch_size,
            reshuffle_each_epoch=args.reshuffle_each_epoch,
            shuffle_seed=train_cfg.seed)

    mesh = None
    if args.mesh_data * args.mesh_node > 1:
        from megacrn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, args.mesh_node)

    run = RunDir(args.save_dir, args.dataset)
    if args.dataset.startswith("EXPYTKY"):
        final_eval_fn = _make_expytky_final_eval(model_cfg, data,
                                                 eval_supports)
    elif args.eval_aggregation == "concat":
        final_eval_fn = _make_concat_final_eval(model_cfg, data,
                                                eval_supports)
    result = fit(model_cfg, train_cfg, data, run, resume=args.resume,
                 test_every_epoch=args.test_every_epoch,
                 final_eval_fn=final_eval_fn, mesh=mesh,
                 ckpt_backend=args.ckpt_backend, road_supports=road_supports,
                 profile_dir=args.profile_dir,
                 profile_steps=args.profile_steps)
    print({k: v for k, v in result["test_metrics"].items()})
    return result


if __name__ == "__main__":
    main()
