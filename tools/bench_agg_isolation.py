"""Isolate the graph-aggregation op cost on the real TPU.

Both sparse backends land at ~167 ms/step vs 80.8 ms dense at N=1843
(tools/backend_bench.json) even though the road graph has ~300x fewer
edges than the dense meta-graph — so either the SpMM kernels themselves
are latency-bound, or the overhead lives in the surrounding layout
shuffles. This times JUST ``jax.grad`` (fwd+bwd) of a scalar readout of each
aggregation flavor at the exact shapes the cell uses (x = [x||h] gate
stack, N=1843, B=64, C=33), fwd+bwd, device-resident input. Reported compile_s includes the
first execution (compile + one step).

Usage: python tools/bench_agg_isolation.py [--n 1843] [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1843)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--c", type=int, default=33)
    p.add_argument("--cheb_k", type=int, default=3)
    p.add_argument("--which", type=str, default="dense,coo_xla,coo_pallas")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from megacrn_tpu.data.synthetic import synthetic_road_adjacency
    from megacrn_tpu.kernels.spmm import rcm_ordering
    from megacrn_tpu.kernels.spmm_coo import build_stacked_road_pack
    from megacrn_tpu.ops.graph import (cheb_aggregate,
                                       cheb_aggregate_sparse_stacked,
                                       dual_random_walk_supports)

    adj = synthetic_road_adjacency(a.n, avg_degree=6, seed=0)
    perm = rcm_ordering(adj)
    adj = adj[perm][:, perm]
    s1, s2 = dual_random_walk_supports(adj)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(a.batch, a.n, a.c).astype(np.float32),
                    jnp.bfloat16)
    dense_supports = jnp.stack([jnp.asarray(s1), jnp.asarray(s2)]).astype(
        jnp.bfloat16)

    def run(name, fn):
        f = jax.jit(jax.grad(lambda v: jnp.sum(fn(v).astype(jnp.float32))))
        t0 = time.time()
        g = f(x)
        _ = float(jnp.sum(g.astype(jnp.float32)))
        compile_s = time.time() - t0
        blocks = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                g = f(x)
            _ = float(jnp.sum(g.astype(jnp.float32)))
            blocks.append((time.time() - t0) / 10)
        blocks.sort()
        ms = blocks[len(blocks) // 2] * 1000
        print(json.dumps({"agg": name, "ms_fwd_bwd": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    which = a.which.split(",")
    if "dense" in which:
        run("dense", lambda v: cheb_aggregate(dense_supports, v, a.cheb_k))
    if "coo_xla" in which:
        px = build_stacked_road_pack([s1, s2], impl="xla")
        px = px._replace(pack=px.pack._replace(
            data=px.pack.data.astype(jnp.bfloat16)))
        run("coo_xla",
            lambda v: cheb_aggregate_sparse_stacked(px, v, a.cheb_k))
    if "coo_pallas" in which:
        pp = build_stacked_road_pack([s1, s2], impl="pallas")
        pp = pp._replace(
            pack=pp.pack._replace(data=pp.pack.data.astype(jnp.bfloat16)),
            pack_t=pp.pack_t._replace(
                data=pp.pack_t.data.astype(jnp.bfloat16)))
        run("coo_pallas",
            lambda v: cheb_aggregate_sparse_stacked(pp, v, a.cheb_k))


if __name__ == "__main__":
    main()
