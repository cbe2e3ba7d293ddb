"""Benchmark: MegaCRN training throughput on the current default device.

Prints ONE JSON line:
  {"metric": "train_edges_per_sec", "value": N, "unit": "edges/s",
   "vs_baseline": R, ...extras}

Configuration is the EXPY-TKY headline benchmark shape (N=1843 links, 6->6,
units=32, mem 10/32, batch 64 — BASELINE.md), the largest published config
and the one BASELINE.json names for the edges/s north-star metric.

Metric definition (documented so it is comparable across rounds):
  edges/s = nnz(supports) * support_applications_per_step * batch / sec_per_step
where nnz = 2 * N^2 (two dense learned supports), and applications per train
step counts every forward-pass ``A @ x`` product: (cheb_k - 1) applications
per support per Chebyshev stack, 2 stacks per GCRN cell ([x||h] shared by the
gate, and z*h for the candidate), times (seq_len + horizon) cell steps. The
backward pass is NOT counted (forward edge-traversals only — conservative).

vs_baseline = our sec_per_step advantage over the reference PyTorch
implementation measured in this same environment (tools/torch_baseline.json,
produced by tools/measure_torch_baseline.py; the reference repo publishes no
throughput numbers — BASELINE.md). The reference runs on CPU torch here
(no CUDA in the image); the comparison is identical model shape, identical
train-step semantics (forward+backward+Adam).
"""
from __future__ import annotations

import json
import os
import time

import jax


def main():
    # Persistent compilation cache: the EXPY-TKY-scale step takes ~20s to
    # compile cold; cache it so repeated driver runs start hot.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    n, horizon, seq_len, batch = 1843, 6, 6, 64
    # bfloat16 compute is the production-throughput mode (params stay f32;
    # measured accuracy-neutral on the synthetic training check).
    cfg = MegaCRNConfig(num_nodes=n, seq_len=seq_len, horizon=horizon,
                        rnn_units=32, mem_num=10, mem_dim=32,
                        use_curriculum_learning=True,
                        compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=1e-3, max_grad_norm=None, lamb=0.01, lamb1=0.0,
                       pred_loss="l1_normalized", batch_size=batch)

    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    opt_state = opt.init(params)
    # donate=True matches the production harness (train/loop.py): params +
    # opt state update in place in HBM instead of double-buffering.
    step = make_train_step(cfg, tcfg, opt, donate=True)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (batch, seq_len, n, 1))
    y = jax.random.normal(ks[1], (batch, horizon, n, 1))
    ycov = jax.random.normal(ks[2], (batch, horizon, n, 1))

    # Warmup / compile. float() forces a host transfer — on the axon TPU
    # tunnel block_until_ready does not reliably synchronize.
    params, opt_state, loss = step(params, opt_state, x, y, ycov, 0.0,
                                   jax.random.PRNGKey(2))
    float(loss)

    # Sync every 10 steps: deep unsynced queues wedge the axon tunnel, but a
    # per-step sync adds the full ~25-100 ms tunnel round-trip to every step
    # and overstates the time by ~30%. 10-step blocks amortize the RTT; the
    # MEDIAN block defends against the tunnel's intermittent ~180 s
    # stall-and-recover episodes polluting the measurement.
    steps = 30
    key = jax.random.PRNGKey(3)  # per-step keys fold in on-device
    block_times = []
    i = 0
    for _ in range(steps // 10):
        t0 = time.time()
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, x, y, ycov,
                                           float(i), key)
            i += 1
        loss_val = float(loss)
        block_times.append((time.time() - t0) / 10)
    block_times.sort()
    sec_per_step = block_times[len(block_times) // 2]

    nnz = 2 * n * n
    apps_per_support_stack = cfg.cheb_k - 1  # A-applications per support
    aggregations_per_cell = 2  # [x||h] stack + z*h stack
    cells_per_step = seq_len + horizon
    edge_traversals = (nnz * apps_per_support_stack * aggregations_per_cell
                       * cells_per_step * batch)
    edges_per_sec = edge_traversals / sec_per_step

    baseline_path = os.path.join(os.path.dirname(__file__), "tools",
                                 "torch_baseline.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs_baseline = ref["best_sec_per_step"] / sec_per_step

    print(json.dumps({
        "metric": "train_edges_per_sec",
        "value": round(edges_per_sec / 1e9, 3),
        "unit": "Gedges/s",
        "vs_baseline": round(vs_baseline, 2),
        "sec_per_step": round(sec_per_step, 5),
        "config": "EXPYTKY-1843 B64 6->6 units32",
        "device": str(jax.devices()[0]),
        "loss_finite": bool(loss_val == loss_val),
    }))


if __name__ == "__main__":
    main()
