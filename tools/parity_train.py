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


def run_torch(model, data, model_cfg, train_cfg, ckpt_path):
    """The reference training protocol (traintest_MegaCRN.py:100-155),
    driving the imported reference model on our loaders."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, "/root/reference/model")
    from utils import (masked_mae_loss, masked_mape_loss,  # noqa: E402
                       masked_mse_loss)

    mean, std = float(data["scaler_mean"]), float(data["scaler_std"])
    inv = lambda t: t * std + mean
    separate_loss = nn.TripletMarginLoss(margin=1.0)
    compact_loss = nn.MSELoss()

    def batches(loader):
        from megacrn_tpu.data.loader import prepare_x_y

        for x, y in loader:
            x0, y0, yc = prepare_x_y(x, y, model_cfg.input_dim,
                                     model_cfg.output_dim)
            yield (torch.from_numpy(x0), torch.from_numpy(y0),
                   torch.from_numpy(yc))

    def composite(output, y, query, pos, neg):
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

    optimizer = torch.optim.Adam(model.parameters(), lr=train_cfg.lr,
                                 eps=train_cfg.epsilon)
    lr_scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, milestones=list(train_cfg.lr_milestones),
        gamma=train_cfg.lr_decay_ratio)
    min_val, batches_seen = float("inf"), 0
    traj = []
    for _ in range(train_cfg.epochs):
        model.train()
        for x, y, yc in batches(data["train_loader"]):
            optimizer.zero_grad()
            output, h_att, query, pos, neg = model(x, yc, y, batches_seen)
            loss, _ = composite(output, y, query, pos, neg)
            batches_seen += 1
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           train_cfg.max_grad_norm)
            optimizer.step()
        lr_scheduler.step()
        val = evaluate(data["val_loader"])
        traj.append(val)
        if val["loss"] < min_val:
            min_val = val["loss"]
            torch.save(model.state_dict(), ckpt_path)
    model.load_state_dict(torch.load(ckpt_path))
    test = evaluate(data["test_loader"])
    return {"val_trajectory": traj, "test": test, "best_val": min_val}


def run_parity(epochs=3, nodes=16, steps=900, seq=12, units=16, mem=4,
               batch_size=64):
    import jax

    # Full-f32 comparison against CPU torch: TPU f32 matmuls are bf16-pass
    # based at default precision, which would confound the framework-parity
    # measurement with a precision difference. Must be set BEFORE any
    # backend-initializing call (jax.default_backend() would pin the tunnel).
    jax.config.update("jax_platforms", "cpu")
    import torch

    sys.path.insert(0, "/root/reference/model")
    from MegaCRN import MegaCRN as TorchMegaCRN  # noqa: E402

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_synthetic
    from megacrn_tpu.interop import (flat_from_torch_state_dict,
                                     params_from_flat)
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.loop import fit

    model_cfg = MegaCRNConfig(num_nodes=nodes, rnn_units=units, mem_num=mem,
                              mem_dim=units, horizon=seq, seq_len=seq,
                              use_curriculum_learning=False)
    train_cfg = TrainConfig(batch_size=batch_size, epochs=epochs,
                            patience=epochs + 1, seed=0,
                            lr_milestones=(max(epochs - 1, 1),))
    data = build_synthetic(num_nodes=nodes, num_steps=steps, seq_len=seq,
                           horizon=seq, batch_size=batch_size, seed=3)

    torch.manual_seed(7)
    tmodel = TorchMegaCRN(
        num_nodes=nodes, input_dim=model_cfg.input_dim,
        output_dim=model_cfg.output_dim, horizon=seq, rnn_units=units,
        num_layers=model_cfg.num_layers, mem_num=mem, mem_dim=units,
        cheb_k=model_cfg.cheb_k, ycov_dim=model_cfg.ycov_dim,
        cl_decay_steps=model_cfg.cl_decay_steps,
        use_curriculum_learning=False)
    init_params = params_from_flat(
        flat_from_torch_state_dict(tmodel.state_dict(),
                                   model_cfg.num_layers),
        model_cfg.num_layers)

    import tempfile

    import json as _json

    with tempfile.TemporaryDirectory() as td:
        torch_res = run_torch(tmodel, data, model_cfg, train_cfg,
                              os.path.join(td, "ref.pt"))
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
                   "seq": seq, "units": units, "batch_size": batch_size},
        "torch": {"val_trajectory": torch_res["val_trajectory"],
                  "test": torch_res["test"],
                  "best_val": torch_res["best_val"]},
        "jax": {"val_trajectory": jax_traj,
                "test": {k: jax_res["test_metrics"][k]
                         for k in ("mae", "mape", "rmse")},
                "best_val": jax_res["best_val"]},
    }


def write_report(res, path="PARITY.md"):
    t, j = res["torch"], res["jax"]
    lines = [
        "# Train-to-train numerical parity: reference torch vs megacrn-tpu",
        "",
        "Identical synthetic dataset (same arrays, same batch order),",
        "identical initial weights (torch init converted via",
        "`megacrn_tpu.interop`), identical protocol",
        "(`model/traintest_MegaCRN.py:100-155`), curriculum disabled on both",
        "sides (host-RNG mechanism, only distributional parity possible —",
        "SURVEY.md 7.4). Generated by `tools/parity_train.py`; asserted in",
        "CI by `tests/test_parity_e2e.py` at a smaller configuration.",
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
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--nodes", type=int, default=16)
    p.add_argument("--steps", type=int, default=900)
    p.add_argument("--report", action="store_true",
                   help="write PARITY.md + tools/parity.json")
    a = p.parse_args()
    res = run_parity(epochs=a.epochs, nodes=a.nodes, steps=a.steps)
    print(json.dumps(res, indent=1))
    if a.report:
        with open(os.path.join(os.path.dirname(__file__), "parity.json"),
                  "w") as f:
            json.dump(res, f, indent=1)
        write_report(res, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PARITY.md"))
