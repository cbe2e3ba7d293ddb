"""Per-backend TPU step-time benchmark at the EXPY-TKY headline shapes.

Measures the full train step (forward + backward + Adam) for each graph
backend at identical (N, B, T, units) settings and a road-sparsity graph
(synthetic_road_adjacency; the real EXPY-TKY blobs are absent from this
environment — same degree profile). Semantics differ by design:

* ``dense``        — reference parity: learned dense meta-graph supports.
* ``sparse_meta``  — learned meta-graph RESTRICTED to the road edge pattern
                     (SDDMM + masked softmax + block SpMM, all XLA).
* ``road_sparse``  — static dual-random-walk road supports through the
                     Pallas block-ELL SpMM (learned graph bypassed for
                     aggregation).

So ms/step is the comparable axis; per-backend edges/s uses each backend's
OWN effective nnz (dense: 2N^2; sparse: 2 * nnz(pattern tiles) * 128^2 for
tile-granular math, reported alongside true edge nnz).

Writes/updates tools/backend_bench.json after EVERY backend (partial results
survive a timeout) — run under a generous timeout; first Pallas compile via
the remote Mosaic path takes ~5 minutes (CLAUDE.md).

Usage: python tools/bench_backends.py [--n 1843] [--backends a,b,c]
       [--steps 20] [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402

sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tools", "backend_bench.json")


def build_graph(n):
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import rcm_ordering

    adj = synthetic_road_adjacency(n, avg_degree=6, seed=0)
    perm = rcm_ordering(adj)
    return adj[perm][:, perm]


def make_supports(backend, adj):
    if backend.startswith("dense"):
        return None
    if backend.startswith("road_sparse"):
        from megacrn_tpu.kernels.spmm_coo import build_stacked_road_pack
        from megacrn_tpu.ops.graph import dual_random_walk_supports

        s1, s2 = dual_random_walk_supports(adj)
        if backend == "road_sparse_ell":
            from megacrn_tpu.kernels.spmm_ell_node import \
                build_stacked_node_ell

            return build_stacked_node_ell([s1, s2])
        impl = "xla" if backend == "road_sparse_xla" else "pallas"
        return build_stacked_road_pack([s1, s2], impl=impl)
    if backend.startswith("sparse_meta"):
        pat = ((adj != 0) | (adj.T != 0)).astype(np.float32)
        np.fill_diagonal(pat, 1.0)
        if backend == "sparse_meta_node":
            from megacrn_tpu.kernels.sparse_graph_node import \
                build_node_pattern

            return build_node_pattern(pat)
        from megacrn_tpu.kernels.sparse_graph import build_block_pattern

        return build_block_pattern(pat)
    raise ValueError(backend)


def bench_backend(backend, adj, n, batch, steps, compute_dtype):
    import jax
    import jax.numpy as jnp

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    seq = horizon = 6
    if backend.startswith("road_sparse"):
        graph_backend = "road_sparse"
    elif backend.startswith("dense"):
        graph_backend = "dense"
    elif backend.startswith("sparse_meta"):
        graph_backend = "sparse_meta"
    else:
        graph_backend = backend
    cfg = MegaCRNConfig(num_nodes=n, seq_len=seq, horizon=horizon,
                        rnn_units=32, mem_num=10, mem_dim=32,
                        use_curriculum_learning=True,
                        graph_backend=graph_backend,
                        # dense_stacked = the round-3 tall-matmul A/B
                        # variant (measured slower; kept for regression
                        # tracking).
                        dense_impl=("stacked"
                                    if backend == "dense_stacked"
                                    else "recursive"),
                        compute_dtype=compute_dtype,
                        # The TILE sparse_meta's gathered (nblk, R, 128,
                        # B*C) x-tiles saved per scan step OOM 16GB HBM at
                        # N=1843 B=64; remat recomputes them in the
                        # backward. The node-granular impl retains only
                        # (N, D) weights + (N, F) features — no remat.
                        remat=(backend == "sparse_meta"))
    tcfg = TrainConfig(lr=1e-3, max_grad_norm=None, lamb=0.01, lamb1=0.0,
                       pred_loss="l1_normalized", batch_size=batch)
    supports = make_supports(backend, adj)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(params)
    step = make_train_step(cfg, tcfg, opt, road_supports=supports,
                           donate=False)

    rs = np.random.RandomState(1)
    # Device-resident batches: feeding numpy would add the host->device
    # tunnel transfer (~8MB, >100 ms through axon) to every measured step.
    x = jnp.asarray(rs.randn(batch, seq, n, 1).astype(np.float32))
    y = jnp.asarray(rs.randn(batch, horizon, n, 1).astype(np.float32))
    ycov = jnp.asarray(rs.randn(batch, horizon, n, 1).astype(np.float32))

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x, y, ycov,
                                   jnp.float32(0.0), jax.random.PRNGKey(2))
    loss_val = float(loss)  # host transfer: the only reliable axon sync
    compile_s = time.time() - t0

    key = jax.random.PRNGKey(3)
    block_times = []
    i = 0
    for _ in range(max(1, steps // 10)):
        t0 = time.time()
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, x, y, ycov,
                                           jnp.float32(float(i)), key)
            i += 1
        loss_val = float(loss)
        block_times.append((time.time() - t0) / 10)
    block_times.sort()
    sec_per_step = block_times[len(block_times) // 2]

    # Effective nnz per backend (for its own edges/s number).
    if backend.startswith("dense"):
        nnz = 2 * n * n
    elif backend == "road_sparse_ell":
        from megacrn_tpu.kernels.spmm_ell_node import pack_nnz

        nnz = pack_nnz(supports)
    elif backend.startswith("road_sparse"):
        nnz = int(np.count_nonzero(np.asarray(supports.pack.data)))
    else:  # sparse_meta (all granularities): true pattern edges x 2 sup
        masks = (supports.mask if isinstance(supports.mask, tuple)
                 else (supports.mask,))
        nnz = 2 * int(sum(np.asarray(m).sum() for m in masks))
    apps = 2  # cheb_k - 1
    aggs = 2  # [x||h] stack + candidate stack
    cells = seq + horizon
    edges_per_sec = nnz * apps * aggs * cells * batch / sec_per_step
    return {
        "backend": backend, "n": n, "batch": batch,
        "compute_dtype": compute_dtype,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(sec_per_step * 1000, 2),
        "effective_nnz": nnz,
        "gedges_per_sec": round(edges_per_sec / 1e9, 2),
        "loss_finite": bool(np.isfinite(loss_val)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1843)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--backends", type=str,
                   default="road_sparse,sparse_meta,dense")
    a = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    adj = build_graph(a.n)
    results = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for backend in a.backends.split(","):
        # Every backend measures its production bf16 compute mode (the
        # kernels narrow MXU inputs, accumulation stays f32).
        dtype = "bfloat16"
        print(f"[bench_backends] {backend} N={a.n} ...", flush=True)
        r = bench_backend(backend, adj, a.n, a.batch, a.steps, dtype)
        print(json.dumps(r), flush=True)
        results = [x for x in results
                   if not (x["backend"] == backend and x["n"] == a.n)]
        results.append(r)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
