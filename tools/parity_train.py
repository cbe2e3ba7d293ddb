"""Train-to-train numerical parity: reference torch harness vs megacrn-tpu.

Runs BOTH frameworks on the identical synthetic dataset (same arrays, same
batch order), from the identical initial weights (the torch init converted
via megacrn_tpu.interop), under the identical protocol
(model/traintest_MegaCRN.py:100-155: Adam(lr, eps=1e-3), per-epoch
MultiStepLR, grad clip 5, composite masked-MAE-on-inverse-scale objective,
best-val checkpoint, reload + test), then compares the per-epoch val
loss/MAE trajectories and the final best-checkpoint test metrics.

Curriculum learning is disabled on both sides so the runs are deterministic
— its mechanism is host-RNG driven in torch and PRNG-driven here, so only
distributional parity is possible for it (SURVEY.md section 7.4); every
other component then composes into a numerically matching trajectory.

The torch side below is an independent transcription of the reference
protocol semantics (citations inline), driving the reference's OWN model
imported from /root/reference/model/MegaCRN.py.

Usage: python tools/parity_train.py [--epochs 3] [--nodes 16] [--report]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_torch(model, data, model_cfg, train_cfg, ckpt_path,
              protocol="canonical"):
    """The reference training protocol, driving the imported reference model
    on our loaders. ``protocol``:

    * 'canonical' — traintest_MegaCRN.py:100-155: masked MAE on the
      inverse-transformed scale, Adam(lr, eps=1e-3), grad clip 5.
    * 'expytky' — model_EXPYTKY/traintest_MegaCRN.py:62-121: plain L1 on the
      NORMALIZED scale, Adam(lr) with torch's default eps (1e-8), NO grad
      clipping.
    """
    import torch
    import torch.nn as nn

    sys.path.insert(0, "/root/reference/model")
    from utils import (masked_mae_loss, masked_mape_loss,  # noqa: E402
                       masked_mse_loss)

    mean, std = float(data["scaler_mean"]), float(data["scaler_std"])
    inv = lambda t: t * std + mean
    separate_loss = nn.TripletMarginLoss(margin=1.0)
    compact_loss = nn.MSELoss()
    l1 = nn.L1Loss()

    # Drive the reference model at ITS parameter dtype (double() for the
    # float64 control runs); the f32 -> f64 upcast of identical loader
    # arrays is exact, so both frameworks still see identical inputs.
    model_dtype = next(model.parameters()).dtype

    def batches(loader):
        from megacrn_tpu.data.loader import prepare_x_y

        for x, y in loader:
            x0, y0, yc = prepare_x_y(x, y, model_cfg.input_dim,
                                     model_cfg.output_dim)
            yield (torch.from_numpy(x0).to(model_dtype),
                   torch.from_numpy(y0).to(model_dtype),
                   torch.from_numpy(yc).to(model_dtype))

    def composite(output, y, query, pos, neg):
        if protocol == "expytky":
            loss1 = l1(output, y)
        else:
            loss1 = masked_mae_loss(inv(output), inv(y))
        loss2 = separate_loss(query, pos.detach(), neg.detach())
        loss3 = compact_loss(query, pos.detach())
        return (loss1 + train_cfg.lamb * loss2 + train_cfg.lamb1 * loss3,
                loss1)

    def evaluate(loader):
        with torch.no_grad():
            model.eval()
            losses, maes, mapes, mses = [], [], [], []
            for x, y, yc in batches(loader):
                output, h_att, query, pos, neg = model(x, yc)
                loss, _ = composite(output, y, query, pos, neg)
                losses.append(loss.item())
                maes.append(masked_mae_loss(inv(output), inv(y)).item())
                mapes.append(masked_mape_loss(inv(output), inv(y)).item())
                mses.append(masked_mse_loss(inv(output), inv(y)).item())
            return {"loss": float(np.mean(losses)),
                    "mae": float(np.mean(maes)),
                    "mape": float(np.mean(mapes)),
                    "rmse": float(np.sqrt(np.mean(mses)))}

    if protocol == "expytky":
        # model_EXPYTKY/traintest_MegaCRN.py:74 — Adam WITHOUT the eps
        # override (torch default 1e-8), and no clipping anywhere.
        optimizer = torch.optim.Adam(model.parameters(), lr=train_cfg.lr)
    else:
        optimizer = torch.optim.Adam(model.parameters(), lr=train_cfg.lr,
                                     eps=train_cfg.epsilon)
    lr_scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, milestones=list(train_cfg.lr_milestones),
        gamma=train_cfg.lr_decay_ratio)
    min_val, batches_seen, wait = float("inf"), 0, 0
    traj = []
    for epoch in range(train_cfg.epochs):
        model.train()
        for x, y, yc in batches(data["train_loader"]):
            optimizer.zero_grad()
            output, h_att, query, pos, neg = model(x, yc, y, batches_seen)
            loss, _ = composite(output, y, query, pos, neg)
            batches_seen += 1
            loss.backward()
            if train_cfg.max_grad_norm is not None:
                torch.nn.utils.clip_grad_norm_(model.parameters(),
                                               train_cfg.max_grad_norm)
            optimizer.step()
        lr_scheduler.step()
        val = evaluate(data["val_loader"])
        traj.append(val)
        print(f"[torch] epoch {epoch + 1} val {val['loss']:.6f}", flush=True)
        # Early stop exactly as the reference (traintest_MegaCRN.py:141-150):
        # best-val checkpoint on improvement, wait counter otherwise, break
        # when the counter hits patience.
        if val["loss"] < min_val:
            min_val = val["loss"]
            wait = 0
            torch.save(model.state_dict(), ckpt_path)
        else:
            wait += 1
            if wait == train_cfg.patience:
                break
    model.load_state_dict(torch.load(ckpt_path))
    test = evaluate(data["test_loader"])
    return {"val_trajectory": traj, "test": test, "best_val": min_val}


def run_parity(epochs=3, nodes=16, steps=900, seq=12, units=16, mem_num=4,
               mem_dim=None, batch_size=64, protocol="canonical",
               patience=None, milestones=None, lr=None, min_speed=None,
               missing_rate=0.02, float64=False):
    """``patience``/``milestones`` default to the no-early-stop, single-
    late-milestone setup of the short parity runs; the converged experiment
    passes real values so both sides cross LR decays and early-stop on
    their own val plateaus (model/traintest_MegaCRN.py:104-105,146-150)."""
    import jax

    # Full-f32 comparison against CPU torch: TPU f32 matmuls are bf16-pass
    # based at default precision, which would confound the framework-parity
    # measurement with a precision difference. Must be set BEFORE any
    # backend-initializing call (jax.default_backend() would pin the tunnel).
    jax.config.update("jax_platforms", "cpu")
    if float64:
        # The precision-control mode: both sides in double. f32 trajectories
        # at the published lr=0.01 diverge chaotically (step-size-amplified
        # float noise — see PARITY.md); f64 shrinks the per-op noise floor
        # ~1e9x, so if the divergence is noise (not semantics) the f64
        # trajectories must glue. Must be set before any tracing.
        jax.config.update("jax_enable_x64", True)
    import torch

    sys.path.insert(0, "/root/reference/model")
    from MegaCRN import MegaCRN as TorchMegaCRN  # noqa: E402

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.interop import (flat_from_torch_state_dict,
                                     params_from_flat)
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    mem_dim = units if mem_dim is None else mem_dim
    patience = epochs + 1 if patience is None else patience
    milestones = ((max(epochs - 1, 1),) if milestones is None
                  else tuple(milestones))
    model_cfg = MegaCRNConfig(num_nodes=nodes, rnn_units=units,
                              mem_num=mem_num, mem_dim=mem_dim, horizon=seq,
                              seq_len=seq, use_curriculum_learning=False,
                              compute_dtype="float64" if float64
                              else "float32")
    if protocol == "expytky":
        # model_EXPYTKY/traintest_MegaCRN.py:152-176 protocol knobs; the
        # double xavier_uniform init happens on the TORCH side below and is
        # converted, so reinit_xavier_uniform stays False here (identical
        # weights by construction, not by matching RNG draws).
        train_cfg = TrainConfig(batch_size=batch_size, epochs=epochs,
                                patience=patience, seed=0, lr=0.001,
                                epsilon=1e-8, max_grad_norm=None,
                                lamb=0.01, lamb1=0.0,
                                pred_loss="l1_normalized",
                                lr_milestones=milestones)
    else:
        train_cfg = TrainConfig(batch_size=batch_size, epochs=epochs,
                                patience=patience, seed=0,
                                lr_milestones=milestones,
                                **({} if lr is None else {"lr": lr}))
    # The expytky fixture compares MAPE, which is ill-conditioned on targets
    # passing near zero — floor the synthetic speeds at a real-traffic 20
    # so all four metrics demonstrate parity (canonical fixtures keep the
    # historical 0-floor data for trajectory continuity across rounds).
    if min_speed is None:
        min_speed = 20.0 if protocol == "expytky" else 0.0
    # Pinned shuffle_rng: deterministic batch order run-to-run (the loader
    # otherwise draws a fresh OS-entropy generator for its one-shot
    # shuffle); both frameworks consume the identical loaders either way.
    data = build_synthetic(num_nodes=nodes, num_steps=steps, seq_len=seq,
                           horizon=seq, batch_size=batch_size, seed=3,
                           min_speed=min_speed, missing_rate=missing_rate,
                           shuffle_rng=np.random.default_rng(11))

    if float64:
        # The reference model materialises hidden-state zeros at torch's
        # default dtype (model/MegaCRN.py:68-71 init_hidden), so .double()
        # on the parameters alone leaves float32 states in the graph.
        torch.set_default_dtype(torch.float64)
    torch.manual_seed(7)
    tmodel = TorchMegaCRN(
        num_nodes=nodes, input_dim=model_cfg.input_dim,
        output_dim=model_cfg.output_dim, horizon=seq, rnn_units=units,
        num_layers=model_cfg.num_layers, mem_num=mem_num, mem_dim=mem_dim,
        cheb_k=model_cfg.cheb_k, ycov_dim=model_cfg.ycov_dim,
        cl_decay_steps=model_cfg.cl_decay_steps,
        use_curriculum_learning=False)
    if float64:
        tmodel = tmodel.double()
    if protocol == "expytky":
        # The reference's post-construction re-init
        # (model_EXPYTKY/traintest_MegaCRN.py:27-35).
        import torch.nn as nn

        for p in tmodel.parameters():
            if p.dim() > 1:
                nn.init.xavier_uniform_(p)
            else:
                nn.init.uniform_(p)
    init_params = params_from_flat(
        flat_from_torch_state_dict(tmodel.state_dict(),
                                   model_cfg.num_layers),
        model_cfg.num_layers,
        dtype=jax.numpy.float64 if float64 else jax.numpy.float32)

    import tempfile

    import json as _json

    with tempfile.TemporaryDirectory() as td:
        torch_res = run_torch(tmodel, data, model_cfg, train_cfg,
                              os.path.join(td, "ref.pt"), protocol=protocol)
        run = RunDir(td, "PARITY", snapshot_sources=False)
        jax_res = fit(model_cfg, train_cfg, data, run,
                      test_every_epoch=False, initial_params=init_params)
        jax_traj = []
        for line in open(run.metrics_path):
            rec = _json.loads(line)
            if "val" in rec:
                jax_traj.append({k: rec["val"][k]
                                 for k in ("loss", "mae", "mape", "rmse")})
    return {
        "config": {"nodes": nodes, "epochs": epochs, "steps": steps,
                   "seq": seq, "units": units, "mem_num": mem_num,
                   "mem_dim": mem_dim, "batch_size": batch_size,
                   "protocol": protocol, "patience": patience,
                   "milestones": list(milestones), "lr": lr,
                   "min_speed": min_speed, "missing_rate": missing_rate,
                   "float64": float64},
        "torch": {"val_trajectory": torch_res["val_trajectory"],
                  "test": torch_res["test"],
                  "best_val": torch_res["best_val"]},
        "jax": {"val_trajectory": jax_traj,
                "test": {k: jax_res["test_metrics"][k]
                         for k in ("mae", "mape", "rmse")},
                "best_val": jax_res["best_val"]},
    }


def _section(tag, res):
    t, j = res["torch"], res["jax"]
    lines = [
        f"## {tag}",
        "",
        f"Config: {res['config']}",
        "",
        "| epoch | torch val loss | jax val loss | torch val MAE | jax val MAE |",
        "|---|---|---|---|---|",
    ]
    for i, (a, b) in enumerate(zip(t["val_trajectory"], j["val_trajectory"])):
        lines.append(f"| {i + 1} | {a['loss']:.6f} | {b['loss']:.6f} | "
                     f"{a['mae']:.6f} | {b['mae']:.6f} |")
    lines += [
        "",
        "Final best-checkpoint test metrics:",
        "",
        "| metric | torch | jax | rel diff |",
        "|---|---|---|---|",
    ]
    for k in ("mae", "mape", "rmse"):
        a, b = t["test"][k], j["test"][k]
        rel = abs(a - b) / max(abs(a), 1e-12)
        lines.append(f"| {k} | {a:.6f} | {b:.6f} | {rel:.2e} |")
    lines.append("")
    return lines


def write_report(runs: dict, path="PARITY.md"):
    """Regenerate PARITY.md from every recorded run (tools/parity_runs.json,
    one section per tag: protocols x shapes, plus the GTS/MegaCRNx families
    from their own tools)."""
    lines = [
        "# Train-to-train numerical parity: reference torch vs megacrn-tpu",
        "",
        "Identical synthetic dataset (same arrays, same batch order),",
        "identical initial weights (torch init converted via",
        "`megacrn_tpu.interop`), identical protocol, curriculum/Gumbel",
        "disabled on both sides (host-RNG mechanisms, only distributional",
        "parity possible — SURVEY.md 7.4). Generated by",
        "`tools/parity_train.py` (MegaCRN protocols),",
        "`tools/parity_train_gts.py` and `tools/parity_train_megacrnx.py`",
        "(other model families); asserted in CI by",
        "`tests/test_parity_e2e.py` at smaller configurations.",
        "",
        "Note on MAPE: percentage error is ill-conditioned on targets that",
        "pass near zero (|err/y| explodes). The expytky fixture therefore",
        "uses speed-like targets floored at 20 (synthetic_speed_series",
        "min_speed), making all four metrics well-conditioned parity",
        "evidence; the canonical fixtures keep the historical 0-floor data",
        "(MAE/RMSE and val-loss trajectories carry the comparison there).",
        "",
        "Note on scale (canonical-metrla-N207): at the published lr=0.01",
        "the epoch-1 val losses differ ~4% before re-converging to <0.1% by",
        "epoch 3 and <1e-3 on final test. A small-lr control shows this is",
        "lr-amplified chaotic drift, not semantics: the SAME config at",
        "lr=1e-4 matches epoch-1 val loss to 3e-7 relative",
        "(torch 8.4671807 vs jax 8.4671783).",
        "",
        "Note on the converged experiment (canonical-metrla-N207-converged):",
        "both sides train through BOTH MultiStepLR milestones and",
        "early-stop on their own val plateaus (reference semantics,",
        "traintest_MegaCRN.py:104-105,141-150). It runs at lr=0.002: a",
        "control at the published lr=0.01 (B=16, f32 CPU both sides)",
        "diverged chaotically within ONE epoch (val 3.951 vs 4.296, 8.7%)",
        "and the runs landed in different local optima (final MAE rel 0.14,",
        "torch 3.469 vs jax 3.953) — float-noise amplification under a",
        "large step size, the same mechanism as the lr=0.01 note above,",
        "compounded over 20+ epochs; no implementation pair differing in op",
        "order stays glued there. At lr=0.002 the val trajectories match",
        "to ~1e-5..1e-4 relative across all 30 epochs including both LR",
        "decays, with identical best-val/patience decisions every epoch",
        "(neither side's patience fired before the epoch cap; an earlier",
        "lr=0.002 variant with 2% missing values early-stopped at the",
        "identical epoch 24 on both sides).",
        "",
        "Note on the float64 lr=0.01 control",
        "(canonical-metrla-N207-f64-lr0.01): the round-4 chaos explanation",
        "is now MEASURED, not inferred. Both sides run in double (torch",
        "set_default_dtype(float64)+.double(); jax x64 with",
        "compute_dtype='float64'; torch-exact clip_grad_norm_ semantics",
        "max_norm/(norm+1e-6)) at the PUBLISHED lr=0.01 through both",
        "MultiStepLR milestones. Result: final best-checkpoint test metrics",
        "agree to MAE 8.2e-4 / MAPE 1.5e-4 / RMSE 7.8e-4 relative — the",
        "same optimum — where the f32 pair at this lr landed in different",
        "basins (MAE rel 0.14). A transient mid-run divergence (peak 7.5%",
        "at epoch 6) remains and is pure noise-seeded chaos:",
        "tools/parity_divergence.py steps both frameworks from identical",
        "weights in BOTH precisions (pinned batch order, reproducible",
        "artifact tools/parity_divergence.json) and shows the per-step",
        "relative loss difference starting at each precision's noise floor",
        "(7.8e-7 f32, 1.8e-15 f64), growing at the SAME ~10^2.5-per-step",
        "rate once underway (f64: 4e-13 -> 8e-10 -> 4e-7 -> 1.4e-5 ->",
        "4e-4 over steps 4-8), and saturating at the same level and step",
        "(~1e-1/2e-2 at step 8-9) — f64 stays below 1e-9 for 6 steps, f32",
        "leaves its floor by step 4; precision shifts the divergence",
        "ONSET, never the",
        "dynamics, which is exactly the signature of float noise under an",
        "edge-of-stability step size and the opposite of a semantic",
        "difference (which would appear as a precision-independent offset",
        "from step 1). The epoch-8/16 LR decays then re-glue the f64 pair",
        "(epochs 14-20 vals within 5.5e-4..1.6e-3).",
        "",
        "Note on GTS: the straight-through hard-argmax graph sampler is a",
        "DISCONTINUOUS function of the logits, so once any edge flips from",
        "accumulated float drift the trajectories legitimately diverge;",
        "epoch-1 agreement at ~1e-5 with bounded (<1%) drift afterwards is",
        "the achievable standard for that family.",
        "",
    ]
    for tag in sorted(runs):
        lines += _section(tag, runs[tag])
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


RUNS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "parity_runs.json")


def record_and_report(tag, res):
    runs = {}
    if os.path.exists(RUNS_PATH):
        with open(RUNS_PATH) as f:
            runs = json.load(f)
    legacy = os.path.join(os.path.dirname(RUNS_PATH), "parity.json")
    if "canonical-toy" not in runs and os.path.exists(legacy):
        with open(legacy) as f:
            runs["canonical-toy"] = json.load(f)
    runs[tag] = res
    with open(RUNS_PATH, "w") as f:
        json.dump(runs, f, indent=1)
    write_report(runs, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY.md"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--nodes", type=int, default=16)
    p.add_argument("--steps", type=int, default=900)
    p.add_argument("--seq", type=int, default=12)
    p.add_argument("--units", type=int, default=16)
    p.add_argument("--mem_num", type=int, default=4)
    p.add_argument("--mem_dim", type=int, default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--protocol", type=str, default="canonical",
                   choices=["canonical", "expytky"])
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience (default: no early stop)")
    p.add_argument("--milestones", type=eval, default=None,
                   help="lr milestone epochs, e.g. [8,16]")
    p.add_argument("--lr", type=float, default=None,
                   help="override the protocol lr")
    p.add_argument("--min_speed", type=float, default=None,
                   help="synthetic speed floor (MAPE conditioning)")
    p.add_argument("--missing_rate", type=float, default=0.02,
                   help="synthetic missing-value (exact zero) rate; 0 "
                        "makes canonical masked MAPE well-conditioned "
                        "(zeros do not survive the scale/inverse roundtrip "
                        "exactly, leaving ~1e-7 denominators)")
    p.add_argument("--float64", action="store_true",
                   help="run BOTH sides in double precision (the published-"
                        "lr chaos control: f64 trajectories must glue if "
                        "the f32 divergence is float noise, not semantics)")
    p.add_argument("--tag", type=str, default=None,
                   help="section name in PARITY.md (default: protocol-N<nodes>)")
    p.add_argument("--report", action="store_true",
                   help="record in tools/parity_runs.json + regen PARITY.md")
    a = p.parse_args()
    res = run_parity(epochs=a.epochs, nodes=a.nodes, steps=a.steps,
                     seq=a.seq, units=a.units, mem_num=a.mem_num,
                     mem_dim=a.mem_dim, batch_size=a.batch,
                     protocol=a.protocol, patience=a.patience,
                     milestones=a.milestones, lr=a.lr,
                     min_speed=a.min_speed, missing_rate=a.missing_rate,
                     float64=a.float64)
    print(json.dumps(res, indent=1))
    if a.report:
        record_and_report(a.tag or f"{a.protocol}-N{a.nodes}", res)
