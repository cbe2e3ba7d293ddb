"""Train-to-train numerical parity for the MegaCRNx ablation family.

Same methodology as tools/parity_train.py: both frameworks run on the
identical synthetic series (our ratio-windowed loaders feed the torch side
too), from identical initial weights (the torch double-init converted via the
goldens flattening), under the identical model_futurework protocol
(traintest_MegaCRNx.py:115-184: Adam(lr) torch defaults, NO clipping,
shuffle=False loaders, L1/MaskMAE on inverse-transformed predictions vs RAW
targets, sample-weighted epoch means, best-val checkpoint, reload + numpy
test metrics). MegaCRNx has no curriculum and no sampling, so the comparison
is fully deterministic — trajectories should agree to float accumulation
error.

Usage: python tools/parity_train_megacrnx.py [--epochs 3] [--nodes 12]
       [--report] [--memory True --meta True --decoder stepwise]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def torch_params_to_ours(tmodel, num_layers):
    """Reference state_dict -> megacrn-tpu MegaCRNx param pytree (the
    goldens flattening, tools/make_megacrnx_goldens.py)."""
    # np.array(copy=True): .numpy() SHARES memory with the torch tensors,
    # and the torch side trains (mutates) after conversion.
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in tmodel.state_dict().items()}

    def cells(mod):
        out = []
        for i in range(num_layers):
            out.append({
                "gate": {"W": sd[f"{mod}.dcrnn_cells.{i}.gate.weights"],
                         "b": sd[f"{mod}.dcrnn_cells.{i}.gate.bias"]},
                "update": {"W": sd[f"{mod}.dcrnn_cells.{i}.update.weights"],
                           "b": sd[f"{mod}.dcrnn_cells.{i}.update.bias"]},
            })
        return out

    return {
        "node_embeddings": sd["node_embeddings"],
        "memory": {k: sd[f"memory.{k}"] for k in ["Memory", "Wq", "FC_E"]},
        "encoder": cells("encoder"),
        "decoder": cells("decoder"),
        "proj": {"W": sd["proj.0.weight"].T, "b": sd["proj.0.bias"]},
    }


def run_torch(tmodel, data, args):
    """The model_futurework training protocol
    (traintest_MegaCRNx.py:115-184) on our windowed arrays."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, "/root/reference/model_futurework")
    from utils import masked_mae  # noqa: E402

    mean, std = data["scaler_mean"], data["scaler_std"]
    inv = lambda t: t * std + mean
    if args.loss == "MAE":
        criterion = nn.L1Loss()
    else:
        criterion = masked_mae
    separate_loss = nn.TripletMarginLoss(margin=1.0)
    compact_loss = nn.MSELoss()

    def iters(x, y, yc):
        xt = torch.from_numpy(np.asarray(x, np.float32))
        yt = torch.from_numpy(np.asarray(y, np.float32))
        yct = torch.from_numpy(np.asarray(yc, np.float32))
        ds = torch.utils.data.TensorDataset(xt, yt, yct)
        return torch.utils.data.DataLoader(ds, args.batch, shuffle=False)

    x_tv, y_tv, yc_tv = (data["x_trainval"], data["y_trainval"],
                         data["ycov_trainval"])
    train_size = int(len(x_tv) * (1 - args.val_ratio))
    train_iter = iters(x_tv[:train_size], y_tv[:train_size],
                       yc_tv[:train_size])
    val_iter = iters(x_tv[train_size:], y_tv[train_size:], yc_tv[train_size:])
    test_iter = iters(data["x_test"], data["y_test"], data["ycov_test"])

    def composite(y_pred, y, query, pos, neg):
        loss1 = criterion(inv(y_pred), y)
        if query is None:
            return loss1, loss1
        loss2 = separate_loss(query, pos.detach(), neg.detach())
        loss3 = compact_loss(query, pos.detach())
        return loss1 + args.lamb * loss2 + args.lamb1 * loss3, loss1

    def evaluate(it):
        import torch

        with torch.no_grad():
            tmodel.eval()
            loss_sum, n, preds = 0.0, 0, []
            for x, y, yc in it:
                y_pred, h_att, query, pos, neg = tmodel(x, yc)
                loss, _ = composite(y_pred, y, query, pos, neg)
                loss_sum += loss.item() * y.shape[0]
                n += y.shape[0]
                preds.append(inv(y_pred).numpy())
            return loss_sum / n, np.vstack(preds)

    optimizer = torch.optim.Adam(tmodel.parameters(), lr=args.lr)
    min_val, traj = float("inf"), []
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "x.pt")
        import torch as _t

        for _ in range(args.epochs):
            tmodel.train()
            for x, y, yc in train_iter:
                optimizer.zero_grad()
                y_pred, h_att, query, pos, neg = tmodel(x, yc)
                loss, _ = composite(y_pred, y, query, pos, neg)
                loss.backward()
                optimizer.step()
            val_loss, _ = evaluate(val_iter)
            traj.append({"loss": val_loss})
            if val_loss < min_val:
                min_val = val_loss
                _t.save(tmodel.state_dict(), ckpt)
        tmodel.load_state_dict(_t.load(ckpt))
        test_loss, preds = evaluate(test_iter)

    sys.path.insert(0, "/root/reference/model_futurework")
    from metrics import evaluate as np_eval  # noqa: E402

    y_true = np.squeeze(np.asarray(data["y_test"]))
    mse_, rmse_, mae_, mape_ = np_eval(y_true, np.squeeze(preds))
    return {"val_trajectory": traj, "best_val": min_val,
            "test": {"mse": float(mse_), "rmse": float(rmse_),
                     "mae": float(mae_), "mape": float(mape_),
                     "loss": test_loss}}


def run_parity(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    sys.path.insert(0, "/root/reference/model_futurework")
    from MegaCRNx import MegaCRN as RefX  # noqa: E402

    from megacrn_tpu.cli.traintest_megacrnx import build_data, build_parser
    from megacrn_tpu.models.megacrnx import MegaCRNxConfig
    from megacrn_tpu.train.logs import RunDir
    from megacrn_tpu.train.megacrnx_loop import (MegaCRNxTrainConfig,
                                                 fit_megacrnx)

    cli = build_parser().parse_args([
        "--dataset", "SYNTH", "--num_nodes", str(args.nodes),
        "--synth_steps", str(args.steps), "--his_len", str(args.his_len),
        "--seq_len", str(args.seq_len), "--hiddenunits", str(args.units),
        "--mem_num", str(args.mem_num), "--mem_dim", str(args.mem_dim),
        "--batch_size", str(args.batch), "--seed", "100",
        "--loss", args.loss,
        "--memory", str(args.memory), "--meta", str(args.meta),
        "--decoder", args.decoder])
    data = build_data(cli)

    torch.manual_seed(9)
    tmodel = RefX(num_nodes=args.nodes, input_dim=1, output_dim=1,
                  horizon=args.seq_len, rnn_units=args.units, num_layers=1,
                  mem_num=args.mem_num, mem_dim=args.mem_dim,
                  memory_type=args.memory, meta_type=args.meta,
                  decoder_type=args.decoder)
    # getModel's post-construction re-init (traintest_MegaCRNx.py:75-79).
    import torch.nn as nn

    for p in tmodel.parameters():
        if p.dim() > 1:
            nn.init.xavier_uniform_(p)
        else:
            nn.init.uniform_(p)
    init_params = torch_params_to_ours(tmodel, 1)

    torch_res = run_torch(tmodel, data, args)

    model_cfg = MegaCRNxConfig(
        num_nodes=args.nodes, horizon=args.seq_len, seq_len=args.his_len,
        rnn_units=args.units, mem_num=args.mem_num, mem_dim=args.mem_dim,
        memory_type=args.memory, meta_type=args.meta,
        decoder_type=args.decoder)
    train_cfg = MegaCRNxTrainConfig(
        lr=args.lr, epochs=args.epochs, patience=args.epochs + 1,
        batch_size=args.batch, lamb=args.lamb, lamb1=args.lamb1,
        loss=args.loss, val_ratio=args.val_ratio, seed=100)
    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        run = RunDir(td, "PARITYX", snapshot_sources=False)
        jax_res = fit_megacrnx(model_cfg, train_cfg, data, run,
                               initial_params=init_params)
        jax_traj = []
        for line in open(run.metrics_path):
            rec = _json.loads(line)
            if "val_loss" in rec:
                jax_traj.append({"loss": rec["val_loss"]})
    return {
        "config": vars(args),
        "torch": torch_res,
        "jax": {"val_trajectory": jax_traj,
                "best_val": jax_res["best_val"],
                "test": {k: jax_res["test_metrics"][k]
                         for k in ("mse", "rmse", "mae", "mape")}},
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--nodes", type=int, default=12)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--his_len", type=int, default=6)
    p.add_argument("--seq_len", type=int, default=6)
    p.add_argument("--units", type=int, default=16)
    p.add_argument("--mem_num", type=int, default=4)
    p.add_argument("--mem_dim", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lamb", type=float, default=0.01)
    p.add_argument("--lamb1", type=float, default=0.01)
    p.add_argument("--loss", type=str, default="MaskMAE",
                   choices=["MAE", "MaskMAE"])
    p.add_argument("--val_ratio", type=float, default=0.125)
    p.add_argument("--memory", type=lambda s: s == "True", default=True)
    p.add_argument("--meta", type=lambda s: s == "True", default=True)
    p.add_argument("--decoder", type=str, default="stepwise",
                   choices=["sequence", "stepwise"])
    p.add_argument("--report", action="store_true")
    a = p.parse_args()
    res = run_parity(a)
    print(json.dumps(res, indent=1))
    if a.report:
        from parity_train import record_and_report

        tag = (f"megacrnx-{'mem' if a.memory else 'nomem'}-"
               f"{'meta' if a.meta else 'nometa'}-{a.decoder}")
        # MegaCRNx records loss-only trajectories; pad the shared report
        # schema with NaN-free placeholders.
        for side in ("torch", "jax"):
            for e in res[side]["val_trajectory"]:
                e.setdefault("mae", float("nan"))
            res[side]["test"].setdefault("mape", float("nan"))
        record_and_report(tag, res)
