"""Decompose the dense-aggregation cost on the real TPU: raw matmul roofline
vs einsum layouts vs the full Chebyshev stack (fwd-only and fwd+bwd).

Round-3 context: the VERDICT-suggested stacked-polynomial aggregation (one
tall matmul per stack) measured SLOWER than the per-support recursion
(102-114 ms/step vs 81.5), so the bottleneck is NOT matmul chain depth. This
microbench separates (a) the achievable matmul rate at the exact shapes from
(b) the layout/transpose tax of each formulation, to find where the ~50%
matmul-peak gap lives.

Usage: python tools/bench_matmul_layout.py [--n 1843] [--batch 64] [--c 33]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def timeit(fn, args, iters=20):
    """fn must return a SCALAR (in-graph reduction): through the axon tunnel
    the only reliable sync is a host transfer, and transferring anything
    bigger than a scalar pays a tensor-sized tunnel round-trip that swamps
    the measurement."""
    out = fn(*args)
    sync_v = float(out)
    blocks = []
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters // 2):
            out = fn(*args)
        sync_v = float(out)
        blocks.append((time.time() - t0) / (iters // 2))
    return min(blocks), sync_v


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1843)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--c", type=int, default=33)
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from megacrn_tpu.ops.graph import (cheb_aggregate,
                                       cheb_aggregate_prestacked,
                                       cheb_support_stack)

    n, b, c = a.n, a.batch, a.c
    f = b * c
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    dt = jnp.bfloat16
    A = jax.nn.softmax(jax.random.normal(ks[0], (n, n)), -1).astype(dt)
    A2 = jax.nn.softmax(jax.random.normal(ks[3], (n, n)), -1).astype(dt)
    supports = jnp.stack([A, A2])
    X2 = jax.random.normal(ks[1], (n, f)).astype(dt)  # matmul-native layout
    Xb = jax.random.normal(ks[2], (b, n, c)).astype(dt)  # model layout
    stack4 = jnp.concatenate(
        [A, 2.0 * (A @ A) - jnp.eye(n, dtype=dt),
         A2, 2.0 * (A2 @ A2) - jnp.eye(n, dtype=dt)], 0)

    cases = {}

    # (1) Raw square matmul, matmul-native layouts — the achievable rate.
    mm = jax.jit(lambda m, v: jnp.sum((m @ v).astype(jnp.float32)))
    dt_s, _ = timeit(mm, (A, X2), a.iters)
    cases["raw_matmul_NN_NF"] = {"ms": dt_s * 1e3,
                                 "tflops": 2 * n * n * f / dt_s / 1e12}

    # (2) Tall stacked matmul (4N, N) @ (N, F), matmul-native layouts.
    dt_s, _ = timeit(mm, (stack4, X2), a.iters)
    cases["raw_matmul_4NN_NF"] = {"ms": dt_s * 1e3,
                                  "tflops": 8 * n * n * f / dt_s / 1e12}

    # (3) One einsum aggregation in the MODEL layout (b,n,c).
    es = jax.jit(lambda m, v: jnp.sum(jnp.einsum(
        "nm,bmc->bnc", m, v, preferred_element_type=dt
    ).astype(jnp.float32)))
    dt_s, _ = timeit(es, (A, Xb), a.iters)
    cases["einsum_model_layout"] = {"ms": dt_s * 1e3,
                                    "tflops": 2 * n * n * f / dt_s / 1e12}

    # (4) Full recursive Chebyshev stack fwd (4 matmuls + stack).
    rec = jax.jit(lambda s, v: jnp.sum(
        cheb_aggregate(s, v, 3).astype(jnp.float32)))
    dt_s, _ = timeit(rec, (supports, Xb), a.iters)
    cases["cheb_recursive_fwd"] = {"ms": dt_s * 1e3,
                                   "tflops": 8 * n * n * f / dt_s / 1e12}

    # (5) Full prestacked aggregation fwd (1 tall matmul + slices/stack).
    def pre(s, v):
        return jnp.sum(cheb_aggregate_prestacked(
            cheb_support_stack(s, 3), 2, v, 3).astype(jnp.float32))

    pre = jax.jit(pre)
    dt_s, _ = timeit(pre, (supports, Xb), a.iters)
    cases["cheb_prestacked_fwd"] = {"ms": dt_s * 1e3,
                                    "tflops": 8 * n * n * f / dt_s / 1e12}

    # (6/7) fwd+bwd of both (grad wrt supports and x, like the train step).
    for name, agg in (("cheb_recursive_fwdbwd", rec),
                      ("cheb_prestacked_fwdbwd", pre)):
        def scalar_grad(s, v, agg=agg):
            gs, gv = jax.grad(agg, argnums=(0, 1))(s, v)
            return jnp.sum(gv.astype(jnp.float32))

        g = jax.jit(scalar_grad)
        dt_s, _ = timeit(g, (supports, Xb), a.iters)
        cases[name] = {"ms": dt_s * 1e3,
                       "tflops": 3 * 8 * n * n * f / dt_s / 1e12}

    # (8) Chained matmuls inside ONE dispatch — the sustained device rate at
    # the aggregation shape, free of the ~2.6 ms/dispatch tunnel overhead
    # that floors every single-op case above.
    inner = 50

    def chain(m, v):
        return jnp.sum(jax.lax.fori_loop(
            0, inner, lambda i, c: m @ c, v).astype(jnp.float32))

    ch = jax.jit(chain)
    dt_s, _ = timeit(ch, (A, X2), 4)
    cases["chained_matmul_NN_NF_x50"] = {
        "ms": dt_s * 1e3 / inner,
        "tflops": inner * 2 * n * n * f / dt_s / 1e12}

    # (9) Peak reference: 2048^3 square bf16 matmul chain.
    sq = jax.random.normal(ks[0], (2048, 2048)).astype(dt) * 0.02
    dt_s, _ = timeit(ch, (sq, jax.random.normal(
        ks[1], (2048, 2048)).astype(dt)), 4)
    cases["chained_matmul_2048_cube_x50"] = {
        "ms": dt_s * 1e3 / inner,
        "tflops": inner * 2 * 2048 ** 3 / dt_s / 1e12}

    # (10) The full recursive aggregation chained x20 in one dispatch (the
    # model-layout stack incl. its stack/concat layout ops, de-floored).
    inner_agg = 20

    def chain_agg(s, v):
        def body(i, c):
            out = cheb_aggregate(s, c, 3)  # (B, N, 6, C)
            return out[:, :, 1, :] * 0.5 + out[:, :, 4, :] * 0.5
        return jnp.sum(jax.lax.fori_loop(0, inner_agg, body, v)
                       .astype(jnp.float32))

    ca = jax.jit(chain_agg)
    dt_s, _ = timeit(ca, (supports, Xb), 4)
    cases["chained_cheb_recursive_x20"] = {
        "ms": dt_s * 1e3 / inner_agg,
        "tflops": inner_agg * 8 * n * n * f / dt_s / 1e12}

    for k, v in cases.items():
        print(json.dumps({"case": k, "ms": round(v["ms"], 3),
                          "tflops": round(v["tflops"], 1)}), flush=True)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
