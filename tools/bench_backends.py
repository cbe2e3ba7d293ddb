"""Time one MegaCRN train step per graph backend on the current device.

Usage:
  python tools/bench_backends.py [--backend dense|road_sparse|sparse_meta]
                                 [--n 1843] [--steps 30] [--dtype bfloat16]

Same shape/timing discipline as bench.py (EXPY-TKY headline config, 10-step
blocks synced by a host transfer, median block). The sparse backends use the
synthetic road adjacency (the real expy-tky_adj01.npy blob is absent from the
mirror) with RCM ordering applied, matching the pattern density the kernel is
designed for (avg degree ~4).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="sparse_meta",
                    choices=["dense", "road_sparse", "sparse_meta"])
    ap.add_argument("--n", type=int, default=1843)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    n, horizon, seq_len, batch = args.n, 6, 6, args.batch
    cfg = MegaCRNConfig(num_nodes=n, seq_len=seq_len, horizon=horizon,
                        rnn_units=32, mem_num=10, mem_dim=32,
                        use_curriculum_learning=True,
                        graph_backend=args.backend, compute_dtype=args.dtype)
    tcfg = TrainConfig(lr=1e-3, max_grad_norm=None, lamb=0.01, lamb1=0.0,
                       pred_loss="l1_normalized", batch_size=batch)

    road_supports = None
    nnz = 2 * n * n
    if args.backend != "dense":
        adj = np.asarray(synthetic_road_adjacency(n, avg_degree=4, seed=0),
                         np.float32)
        from megacrn_tpu.kernels.spmm import rcm_ordering
        perm = rcm_ordering(adj)
        adj = adj[perm][:, perm]
        if args.backend == "sparse_meta":
            from megacrn_tpu.kernels.sparse_graph import build_block_pattern
            pattern = build_block_pattern(adj)
            road_supports = pattern
            # both supports share the pattern; count masked entries once each
            nnz = 2 * int(np.asarray(pattern.mask).sum())
        else:
            from megacrn_tpu.kernels.spmm import to_block_ell, transpose_block_ell
            # Two random-walk supports (forward + reverse diffusion), matching
            # cfg.num_supports == 2 so the AGCN weight widths line up.
            deg = np.maximum(adj.sum(1, keepdims=True), 1.0)
            sup1 = (adj / deg).astype(np.float32)
            sup2 = np.ascontiguousarray(sup1.T)
            road_supports = [(to_block_ell(s), transpose_block_ell(s))
                             for s in (sup1, sup2)]
            nnz = int((sup1 != 0).sum()) + int((sup2 != 0).sum())

    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(params)
    step = make_train_step(cfg, tcfg, opt, road_supports=road_supports)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (batch, seq_len, n, 1))
    y = jax.random.normal(ks[1], (batch, horizon, n, 1))
    ycov = jax.random.normal(ks[2], (batch, horizon, n, 1))

    t_c = time.time()
    params, opt_state, loss = step(params, opt_state, x, y, ycov, 0.0,
                                   jax.random.PRNGKey(2))
    loss_val = float(loss)
    compile_s = time.time() - t_c

    key = jax.random.PRNGKey(3)
    block_times = []
    i = 0
    for _ in range(max(1, args.steps // 10)):
        t0 = time.time()
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, x, y, ycov,
                                           float(i), key)
            i += 1
        loss_val = float(loss)
        block_times.append((time.time() - t0) / 10)
    block_times.sort()
    sec_per_step = block_times[len(block_times) // 2]

    apps = (cfg.cheb_k - 1) * 2 * (seq_len + horizon) * batch
    print(json.dumps({
        "backend": args.backend,
        "n": n,
        "sec_per_step": round(sec_per_step, 5),
        "compile_s": round(compile_s, 1),
        "gedges_per_sec": round(nnz * apps / sec_per_step / 1e9, 3),
        "nnz": nnz,
        "loss_finite": bool(loss_val == loss_val),
        "device": str(jax.devices()[0]),
        "blocks": [round(b, 5) for b in block_times],
    }))


if __name__ == "__main__":
    main()
