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
import math
import os
import time

import jax


def _median(xs):
    """True median: averages the two middle blocks on even counts (a bare
    ``sorted[n//2]`` would report the pessimistic upper block for the
    2-block 20-step configs)."""
    xs = sorted(xs)
    m = len(xs) // 2
    return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])


def _timed_blocks(step_once, steps):
    """Median-of-10-step-blocks wall time for ``step_once(i)`` (which must
    keep its own state and return the loss array). Sync via float() per
    block — the axon tunnel's block_until_ready does not reliably block."""
    block_times = []
    i = 0
    loss = None
    for _ in range(max(1, steps // 10)):
        t0 = time.time()
        for _ in range(10):
            loss = step_once(i)
            i += 1
        loss_val = float(loss)
        block_times.append((time.time() - t0) / 10)
    return _median(block_times), loss_val


def bench_config(backend, n, batch, steps, seq=6, horizon=6, units=32,
                 mem_num=10, mem_dim=32):
    """One measured config: full train step (forward+backward+Adam, donated
    buffers, bf16 compute), median of 10-step blocks."""
    import jax.numpy as jnp
    import numpy as np

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    cfg = MegaCRNConfig(num_nodes=n, seq_len=seq, horizon=horizon,
                        rnn_units=units, mem_num=mem_num, mem_dim=mem_dim,
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
    state = {"p": params, "o": opt_state}

    def step_once(i):
        state["p"], state["o"], loss = step(state["p"], state["o"], x, y,
                                            ycov, float(i), key)
        return loss

    sec_per_step, loss_val = _timed_blocks(step_once, steps)

    apps = cfg.cheb_k - 1   # A-applications per support stack
    aggs = 2                # [x||h] stack + candidate stack
    cells = seq + horizon
    edges_per_sec = nnz * apps * aggs * cells * batch / sec_per_step
    return {
        "sec_per_step": sec_per_step,
        "gedges": edges_per_sec / 1e9,
        "loss_finite": math.isfinite(loss_val),
    }


def bench_gts(steps=20, train_series_len=23990, batch=64,
              compute_dtype="float32"):
    """GTS train step at the published METR-LA config (model/traintest_GTS.py
    defaults: N=207, 12->12, units 64, diffusion 3, B=64) INCLUDING the
    full-training-series Conv1d feature extractor (model/GTS.py:423-434,
    T_train=23990) inside every forward — the honest per-step cost.
    edges/s accounting: one sampled (N, N) dense support, max_diffusion_step
    A-applications per gconv, 2 gconvs per DCGRU cell, (seq+horizon) cells."""
    import numpy as np
    import optax

    from megacrn_tpu.config import GTSConfig, TrainConfig
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.models import gts
    from megacrn_tpu.train.gts_loop import make_gts_train_step

    cfg = GTSConfig(train_series_len=train_series_len,
                    compute_dtype=compute_dtype)
    tcfg = TrainConfig(batch_size=batch)
    params, bn_state = gts.init_params(jax.random.PRNGKey(0), cfg)
    feas = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (train_series_len, cfg.num_nodes)), np.float32)
    opt = optax.adam(1e-3, eps=1e-3)
    step = make_gts_train_step(cfg, tcfg, opt, 0.0, 1.0, feas,
                               cosine_knn_graph(feas, cfg.knn_k))
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(ks[0], (batch, cfg.seq_len, cfg.num_nodes,
                                  cfg.input_dim))
    y = jax.random.normal(ks[1], (batch, cfg.horizon, cfg.num_nodes,
                                  cfg.output_dim))
    state = {"p": params, "b": bn_state, "o": opt.init(params)}
    key = jax.random.PRNGKey(3)

    def step_once(i):
        state["p"], state["b"], state["o"], loss = step(
            state["p"], state["b"], state["o"], x, y, float(i), key)
        return loss

    float(step_once(0))  # warmup / compile
    sec_per_step, loss_val = _timed_blocks(step_once, steps)
    n = cfg.num_nodes
    edges = (n * n) * cfg.max_diffusion_step * 2 * (
        cfg.seq_len + cfg.horizon) * batch
    return {"sec_per_step": sec_per_step, "gedges": edges / sec_per_step / 1e9,
            "loss_finite": math.isfinite(loss_val)}


def bench_megacrnx(steps=20, batch=64):
    """MegaCRNx train step at its protocol config
    (model_futurework/traintest_MegaCRNx.py defaults: N=207, 12->12,
    units 32, mem 10/32, stepwise decoder, MaskMAE, B=64). edges/s: one
    learned (N, N) support, (cheb_k - 1) A-applications per Chebyshev
    stack, 2 stacks per cell, (seq+horizon) cells."""
    import optax

    from megacrn_tpu.models import megacrnx
    from megacrn_tpu.train.megacrnx_loop import (MegaCRNxTrainConfig,
                                                 make_megacrnx_train_step)

    cfg = megacrnx.MegaCRNxConfig()
    tcfg = MegaCRNxTrainConfig(batch_size=batch)
    params = megacrnx.init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(tcfg.lr)
    step = make_megacrnx_train_step(cfg, tcfg, opt, 0.0, 1.0, donate=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (batch, cfg.seq_len, cfg.num_nodes,
                                  cfg.input_dim))
    y = jax.random.normal(ks[1], (batch, cfg.horizon, cfg.num_nodes,
                                  cfg.output_dim)) + 1.0
    ycov = jax.random.normal(ks[2], (batch, cfg.horizon, cfg.num_nodes,
                                     cfg.ycov_dim))
    state = {"p": params, "o": opt.init(params)}

    def step_once(i):
        state["p"], state["o"], vals = step(state["p"], state["o"], x, y,
                                            ycov)
        return vals[0]

    float(step_once(0))  # warmup / compile
    sec_per_step, loss_val = _timed_blocks(step_once, steps)
    n = cfg.num_nodes
    edges = (n * n) * (cfg.cheb_k - 1) * 2 * (cfg.seq_len + cfg.horizon) * batch
    return {"sec_per_step": sec_per_step, "gedges": edges / sec_per_step / 1e9,
            "loss_finite": math.isfinite(loss_val)}


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
        # (runner, config label, is_headline)
        (lambda: bench_config("dense", 2841, 64, 30),
         "dense N=2841 B=64 6->6 units32", False),
        (lambda: bench_config("dense", 16384, 8, 20),
         "dense N=16384 B=8 6->6 units32", False),
        (lambda: bench_config("ell", 16384, 8, 20),
         "ell N=16384 B=8 6->6 units32", False),
        # The round-5 dense-vs-ELL crossover pair (unrolled small-D gather
        # moved it below N=4096 — STATUS.md perf tables).
        (lambda: bench_config("dense", 4096, 32, 20),
         "dense N=4096 B=32 6->6 units32", False),
        (lambda: bench_config("ell", 4096, 32, 20),
         "ell N=4096 B=32 6->6 units32", False),
        (lambda: bench_config("ell", 32768, 4, 20),
         "ell N=32768 B=4 6->6 units32", False),
        # The published-protocol shapes of the OTHER datasets/families
        # (round-4 VERDICT item 3): PEMS-BAY dense, GTS with the
        # full-series Conv1d extractor, MegaCRNx stepwise.
        (lambda: bench_config("dense", 325, 64, 30, seq=12, horizon=12,
                              units=64, mem_num=20, mem_dim=64),
         "dense N=325 B=64 12->12 units64 [PEMSBAY]", False),
        (lambda: bench_gts(20),
         "GTS N=207 B=64 12->12 units64 diff3 Tfeat=23990 [METRLA]", False),
        (lambda: bench_gts(20, compute_dtype="bfloat16"),
         "GTS bf16 N=207 B=64 12->12 units64 diff3 Tfeat=23990", False),
        (lambda: bench_megacrnx(20),
         "MegaCRNx N=207 B=64 12->12 units32 mem10/32 [protocol]", False),
        # Headline LAST (the cross-round comparable series).
        (lambda: bench_config("dense", 1843, 64, 30),
         "dense N=1843 B=64 6->6 units32 [headline EXPYTKY-1843]", True),
    ]
    for runner, label, headline in matrix:
        try:
            r = runner()
        except Exception as e:  # OOM/tunnel: keep the rest of the matrix
            print(json.dumps({
                "metric": "train_edges_per_sec", "value": 0.0,
                "unit": "Gedges/s", "vs_baseline": 0.0, "config": label,
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
            "config": label,
            "device": device,
            "loss_finite": r["loss_finite"],
        }), flush=True)


if __name__ == "__main__":
    main()
