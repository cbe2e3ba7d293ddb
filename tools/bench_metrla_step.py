"""De-floored analysis of the METR-LA (N=207) train step on the real TPU.

The published headline config (README.md:29-31: N=207, 12->12, units=64,
mem 20/64, B=64) runs ~1/20 the FLOPs of the N=1843 step, so dispatch and
dependency structure — not MXU throughput — set its time. This script
separates, with the in-graph chained method of bench_matmul_layout.py
(single dispatch, scalar readout — single-op timings through the axon
tunnel floor at ~2.6 ms):

1. the dispatched full train step (normal per-step jit calls, what the
   harness pays),
2. the chained train step (lax.fori_loop x10 inside ONE jit — the pure
   device time, no per-step dispatch),
3. the chained eval forward (the per-epoch val/test-eval unit cost),
4. chained dependent matmuls at the aggregation shape, N=207 vs padded
   N=256 (is there MXU-tiling headroom in padding the node axis?),
5. the full step at num_nodes=256 (does padding the whole model help?).

Usage: python tools/bench_metrla_step.py [--batch 64] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=10):
    out = fn(*args)
    float(out)
    blocks = []
    for _ in range(2):
        t0 = time.time()
        for _ in range(max(1, iters // 2)):
            out = fn(*args)
        float(out)
        blocks.append((time.time() - t0) / max(1, iters // 2))
    return min(blocks)


def step_times(n, batch, dtype, iters):
    import jax
    import jax.numpy as jnp

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import (composite_loss, make_eval_step,
                                         make_train_step)

    cfg = MegaCRNConfig(num_nodes=n, rnn_units=64, mem_num=20, mem_dim=64,
                        seq_len=12, horizon=12, compute_dtype=dtype)
    tcfg = TrainConfig(batch_size=batch)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(params)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (batch, 12, n, 1))
    y = jax.random.normal(ks[1], (batch, 12, n, 1))
    ycov = jax.random.normal(ks[2], (batch, 12, n, 1))

    # (1) dispatched step: the harness-visible per-step cost.
    step = make_train_step(cfg, tcfg, opt, donate=False)
    step(params, opt_state, x, y, ycov, 0.0, jax.random.PRNGKey(2))
    blocks = []
    for _ in range(3):
        t0 = time.time()
        for i in range(10):
            params2, opt2, loss = step(params, opt_state, x, y, ycov,
                                       float(i), jax.random.PRNGKey(2))
        float(loss)
        blocks.append((time.time() - t0) / 10)
    blocks.sort()
    dispatched_ms = blocks[len(blocks) // 2] * 1e3

    # (2) chained step: fori_loop over the SAME update inside one jit.
    def loss_fn(p, bs):
        out = megacrn.forward(p, x, y_cov=ycov, cfg=cfg, labels=y,
                              batches_seen=bs, rng=jax.random.PRNGKey(3),
                              training=True)
        return composite_loss(out, y, tcfg, 0.0, 1.0)

    inner = 10

    def chain(p, o):
        def body(i, carry):
            p_, o_ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p_, i.astype(np.float32))
            import optax

            updates, o2 = opt.update(grads, o_, p_)
            return (optax.apply_updates(p_, updates), o2)

        p_f, _ = jax.lax.fori_loop(0, inner, body, (p, o))
        return jnp.sum(jax.tree_util.tree_leaves(p_f)[0].astype(jnp.float32))

    chained_ms = timeit(jax.jit(chain), (params, opt_state), iters) / inner * 1e3

    # (3) chained eval forward (per-batch val/test-eval unit).
    def eval_chain(p):
        def body(i, c):
            out = megacrn.forward(p, c, ycov, cfg)
            return c + 0.0 * out.output[:, :, :, :1]

        return jnp.sum(jax.lax.fori_loop(0, inner, body, x)
                       .astype(jnp.float32))

    eval_ms = timeit(jax.jit(eval_chain), (params,), iters) / inner * 1e3
    return dispatched_ms, chained_ms, eval_ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    out = {}
    d207, c207, e207 = step_times(207, a.batch, a.dtype, a.iters)
    out["step_dispatched_ms_n207"] = round(d207, 2)
    out["step_chained_ms_n207"] = round(c207, 2)
    out["eval_fwd_chained_ms_n207"] = round(e207, 2)

    # (4) dependent-matmul chains at the aggregation shape, 207 vs 256.
    dt = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
    f = a.batch * 65  # gate-stack features: units 64 + input 1
    inner = 50
    for n in (207, 256):
        key = jax.random.PRNGKey(0)
        A = jax.nn.softmax(jax.random.normal(key, (n, n)), -1).astype(dt)
        X = jax.random.normal(key, (n, f)).astype(dt)

        def chain(m, v):
            return jnp.sum(jax.lax.fori_loop(
                0, inner, lambda i, c: m @ c, v).astype(jnp.float32))

        s = timeit(jax.jit(chain), (A, X), 4) / inner
        out[f"chained_matmul_n{n}_us"] = round(s * 1e6, 1)
        out[f"chained_matmul_n{n}_tflops"] = round(2 * n * n * f / s / 1e12, 2)

    # (5) the whole model padded to 256 nodes.
    d256, c256, e256 = step_times(256, a.batch, a.dtype, a.iters)
    out["step_dispatched_ms_n256"] = round(d256, 2)
    out["step_chained_ms_n256"] = round(c256, 2)
    out["eval_fwd_chained_ms_n256"] = round(e256, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
