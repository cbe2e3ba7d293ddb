"""Benchmark: MegaCRN training throughput on the current default device.

Prints ONE JSON line PER CONFIG (a measured matrix, not a single point):

  {"metric": "train_edges_per_sec", "value": N, "unit": "Gedges/s",
   "vs_baseline": R, "config": ..., ...}

The matrix covers the measured backend-policy story (STATUS.md perf table):

* dense N=1843 B64  — the EXPY-TKY headline benchmark shape (BASELINE.md)
  and the comparable series across rounds; printed LAST so naive last-line
  parsing still lands on the headline number.
* dense N=2841 B64  — the EXPYTKY_ALL shape.
* dense vs node-ELL at N=16384 B8 — the measured single-chip crossover
  (round 3): the gather-based node-ELL sparse backend beats dense here.
* node-ELL N=32768 B4 — the only backend that fits this size (dense HBM
  OOMs at 16.29G > 15.75G; tile-granular packs explode to 84k tiles).

Metric definition (comparable across rounds):
  edges/s = nnz(supports) * support_applications_per_step * batch / sec_per_step
where nnz = 2 * N^2 for the dense learned supports and nnz(road packs) for
node-ELL (each backend's OWN edge count — the dense and sparse lines are
throughput statements about different operators, the ms_per_step field is
the cross-backend comparable), and applications per train step counts every
forward-pass ``A @ x`` product: (cheb_k - 1) per support per Chebyshev
stack, 2 stacks per GCRN cell, times (seq_len + horizon) cell steps.

vs_baseline = reference-PyTorch sec_per_step / ours, measured in this same
environment at the headline shape (tools/torch_baseline.json; the reference
publishes no throughput numbers — BASELINE.md). Reported on the headline
line; 0.0 on shapes with no measured torch counterpart.
"""
from __future__ import annotations

import json
import os
import time

import jax


def bench_config(backend, n, batch, steps, seq=6, horizon=6):
    """One measured config: full train step (forward+backward+Adam, donated
    buffers, bf16 compute), median of 10-step blocks."""
    import jax.numpy as jnp
    import numpy as np

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    cfg = MegaCRNConfig(num_nodes=n, seq_len=seq, horizon=horizon,
                        rnn_units=32, mem_num=10, mem_dim=32,
                        use_curriculum_learning=True,
                        graph_backend=("road_sparse" if backend == "ell"
                                       else "dense"),
                        compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=1e-3, max_grad_norm=None, lamb=0.01, lamb1=0.0,
                       pred_loss="l1_normalized", batch_size=batch)

    supports = None
    nnz = 2 * n * n
    if backend == "ell":
        from megacrn_tpu.data.synthetic import synthetic_road_adjacency
        from megacrn_tpu.kernels.spmm_ell_node import (
            build_stacked_node_ell, pack_nnz)
        from megacrn_tpu.ops.graph import dual_random_walk_supports

        s1, s2 = dual_random_walk_supports(
            synthetic_road_adjacency(n, avg_degree=6, seed=0))
        supports = build_stacked_node_ell([s1, s2])
        nnz = pack_nnz(supports)
        del s1, s2

    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(params)
    step = make_train_step(cfg, tcfg, opt, road_supports=supports,
                           donate=True)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (batch, seq, n, 1))
    y = jax.random.normal(ks[1], (batch, horizon, n, 1))
    ycov = jax.random.normal(ks[2], (batch, horizon, n, 1))

    # Warmup / compile. float() forces a host transfer — on the axon TPU
    # tunnel block_until_ready does not reliably synchronize.
    params, opt_state, loss = step(params, opt_state, x, y, ycov, 0.0,
                                   jax.random.PRNGKey(2))
    float(loss)

    # Sync every 10 steps: deep unsynced queues wedge the axon tunnel, but a
    # per-step sync adds the full tunnel round-trip to every step. The
    # MEDIAN block defends against the tunnel's intermittent ~180 s
    # stall-and-recover episodes polluting the measurement.
    key = jax.random.PRNGKey(3)  # per-step keys fold in on-device
    block_times = []
    i = 0
    loss_val = 0.0
    for _ in range(max(1, steps // 10)):
        t0 = time.time()
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, x, y, ycov,
                                           float(i), key)
            i += 1
        loss_val = float(loss)
        block_times.append((time.time() - t0) / 10)
    block_times.sort()
    sec_per_step = block_times[len(block_times) // 2]

    apps = cfg.cheb_k - 1   # A-applications per support stack
    aggs = 2                # [x||h] stack + candidate stack
    cells = seq + horizon
    edges_per_sec = nnz * apps * aggs * cells * batch / sec_per_step
    return {
        "sec_per_step": sec_per_step,
        "gedges": edges_per_sec / 1e9,
        "loss_finite": bool(loss_val == loss_val),
    }


def main():
    # Persistent compilation cache: repeated driver runs start hot (the
    # remote-Mosaic caveat does not apply — this matrix is all plain XLA).
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob

    baseline_path = os.path.join(os.path.dirname(__file__), "tools",
                                 "torch_baseline.json")
    ref_sec = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref_sec = json.load(f)["best_sec_per_step"]

    device = str(jax.devices()[0])
    matrix = [
        # (backend, n, batch, steps, is_headline)
        ("dense", 2841, 64, 30, False),
        ("dense", 16384, 8, 20, False),
        ("ell", 16384, 8, 20, False),
        ("ell", 32768, 4, 20, False),
        ("dense", 1843, 64, 30, True),  # headline LAST (comparable series)
    ]
    for backend, n, batch, steps, headline in matrix:
        try:
            r = bench_config(backend, n, batch, steps)
        except Exception as e:  # OOM/tunnel: keep the rest of the matrix
            print(json.dumps({
                "metric": "train_edges_per_sec", "value": 0.0,
                "unit": "Gedges/s", "vs_baseline": 0.0,
                "config": f"{backend} N={n} B={batch}",
                "error": f"{type(e).__name__}: {str(e)[:160]}"}), flush=True)
            continue
        vs = (ref_sec / r["sec_per_step"]
              if (headline and ref_sec) else 0.0)
        print(json.dumps({
            "metric": "train_edges_per_sec",
            "value": round(r["gedges"], 3),
            "unit": "Gedges/s",
            "vs_baseline": round(vs, 2),
            "sec_per_step": round(r["sec_per_step"], 5),
            "config": f"{backend} N={n} B={batch} 6->6 units32"
                      + (" [headline EXPYTKY-1843]" if headline else ""),
            "device": device,
            "loss_finite": r["loss_finite"],
        }), flush=True)


if __name__ == "__main__":
    main()
