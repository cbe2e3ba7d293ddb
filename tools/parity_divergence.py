"""Per-step divergence-rate measurement: the chaos-vs-semantics control.

At the published lr=0.01 (model/traintest_MegaCRN.py:168) the reference and
megacrn-tpu trajectories separate even in float64. This tool shows WHY that
is float noise and not a semantic difference: it steps BOTH frameworks from
identical weights on identical batches in f32 and in f64, printing the
per-step relative loss difference. If the implementations share semantics,
the difference must start at each precision's noise floor (~1e-7 f32,
~1e-15/16 f64) and grow at the SAME exponential rate (the trajectory's
Lyapunov rate under this step size) until it saturates — i.e. precision
shifts the divergence ONSET, not the dynamics. A semantic difference would
instead produce a precision-independent offset from step 1.

Usage: python tools/parity_divergence.py [--steps 16] [--report]
Writes tools/parity_divergence.json with both series.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_precision(float64: bool, steps: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if float64:
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    import torch
    import torch.nn as nn

    if float64:
        torch.set_default_dtype(torch.float64)
    sys.path.insert(0, "/root/reference/model")
    from MegaCRN import MegaCRN as TorchMegaCRN  # noqa: E402
    from utils import masked_mae_loss  # noqa: E402

    import jax.numpy as jnp

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.data.loader import prepare_x_y
    from megacrn_tpu.interop import (flat_from_torch_state_dict,
                                     params_from_flat)
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    nodes, units, seq, mem_num, mem_dim, bsz = 207, 64, 12, 20, 64, 16
    cfg = MegaCRNConfig(num_nodes=nodes, rnn_units=units, mem_num=mem_num,
                        mem_dim=mem_dim, horizon=seq, seq_len=seq,
                        use_curriculum_learning=False,
                        compute_dtype="float64" if float64 else "float32")
    tcfg = TrainConfig(batch_size=bsz, epochs=1, seed=0, lr=0.01,
                       lr_milestones=(8, 16))
    # Pinned shuffle_rng: deterministic batch order so the committed
    # parity_divergence.json (and the onset steps PARITY.md cites from it)
    # reproduce exactly on rerun.
    data = build_synthetic(num_nodes=nodes, num_steps=640, seq_len=seq,
                           horizon=seq, batch_size=bsz, seed=3,
                           min_speed=20.0, missing_rate=0.0,
                           shuffle_rng=np.random.default_rng(11))
    mean, std = float(data["scaler_mean"]), float(data["scaler_std"])
    torch.manual_seed(7)
    tm = TorchMegaCRN(num_nodes=nodes, input_dim=1, output_dim=1,
                      horizon=seq, rnn_units=units, num_layers=1,
                      mem_num=mem_num, mem_dim=mem_dim, cheb_k=3, ycov_dim=1,
                      cl_decay_steps=2000, use_curriculum_learning=False)
    if float64:
        tm = tm.double()
    mdt = next(tm.parameters()).dtype
    params = params_from_flat(
        flat_from_torch_state_dict(tm.state_dict(), 1), 1,
        dtype=jnp.float64 if float64 else jnp.float32)
    opt_t = torch.optim.Adam(tm.parameters(), lr=0.01, eps=1e-3)
    sep = nn.TripletMarginLoss(margin=1.0)
    comp = nn.MSELoss()
    inv = lambda t: t * std + mean
    opt = make_optimizer(tcfg, steps_per_epoch=len(data["train_loader"]))
    step = make_train_step(cfg, tcfg, opt, mean, std, donate=False)
    p, o = params, opt.init(params)
    key = jax.random.PRNGKey(0)
    rels = []
    i = 0
    tag = "f64" if float64 else "f32"
    for x, y in data["train_loader"]:
        x0, y0, yc = prepare_x_y(x, y, 1, 1)
        tx, ty, tyc = (torch.from_numpy(a).to(mdt) for a in (x0, y0, yc))
        opt_t.zero_grad()
        out, _, q, pos, neg = tm(tx, tyc, ty, i)
        tl = (masked_mae_loss(inv(out), inv(ty))
              + 0.01 * sep(q, pos.detach(), neg.detach())
              + 0.01 * comp(q, pos.detach()))
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
        opt_t.step()
        p, o, jl = step(p, o, x0, y0, yc,
                        jnp.asarray(float(i), p["proj"]["b"].dtype), key)
        tv, jv = float(tl), float(jl)
        rel = abs(tv - jv) / abs(tv)
        rels.append(rel)
        print(f"[{tag}] step {i:2d} torch {tv:.14f} jax {jv:.14f} "
              f"rel {rel:.3e}", flush=True)
        i += 1
        if i >= steps:
            break
    return rels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--precision", choices=["f32", "f64", "both"],
                    default="both")
    a = ap.parse_args()
    # x64 must be set before any tracing, so run each precision in a
    # subprocess when doing both.
    if a.precision == "both":
        import subprocess

        out = {}
        for prec in ("f32", "f64"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--steps",
                 str(a.steps), "--precision", prec],
                capture_output=True, text=True, check=True)
            print(r.stdout, end="", flush=True)
            out[prec] = [float(line.rsplit(" ", 1)[1])
                         for line in r.stdout.splitlines() if " rel " in line]
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "parity_divergence.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    else:
        run_precision(a.precision == "f64", a.steps)


if __name__ == "__main__":
    main()
