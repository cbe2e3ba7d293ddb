"""Train-to-train numerical parity for the GTS baseline family.

Methodology as tools/parity_train.py: identical synthetic series and loaders
feed both frameworks, initial weights come from the torch side (converted via
``interop.gts_params_from_torch_state_dict`` after the reference's
``init_model`` dry-run materialises the lazy LayerParams), protocol is
``model/traintest_GTS.py:134-193`` (Adam(lr, eps=1e-3), clip 5, masked-MAE on
the inverse scale + BCE graph loss vs the kNN prior, best-val checkpoint,
reload + test). The two host-RNG mechanisms are disabled/deterministic on
BOTH sides: Gumbel noise (reference ``GTS.sample_gumbel`` patched to zeros;
ours ``gumbel_noise=False`` — identical straight-through argmax semantics)
and curriculum learning (``use_curriculum_learning=False``).

Usage: python tools/parity_train_gts.py [--epochs 3] [--nodes 12] [--report]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_torch(data, node_feas, knn, args, cfg):
    import torch

    sys.path.insert(0, "/root/reference/model")
    # The reference imports torchsummary at module top (GTS.py:6) but only
    # uses it in __main__; the package is absent from this image.
    import types

    sys.modules.setdefault(
        "torchsummary", types.SimpleNamespace(summary=lambda *a, **k: None))
    import GTS as ref_gts  # noqa: E402
    from utils import (masked_mae_loss, masked_mape_loss,  # noqa: E402
                       masked_mse_loss)

    # Determinism: zero the Gumbel noise (module-level patch; the
    # straight-through hard argmax path is unchanged).
    ref_gts.sample_gumbel = lambda device, shape, eps=1e-20: torch.zeros(shape)

    mean, std = float(data["scaler_mean"]), float(data["scaler_std"])
    inv = lambda t: t * std + mean
    model = ref_gts.GTSModel(
        gpu=-1, temperature=cfg.temperature, cl_decay_steps=cfg.cl_decay_steps,
        filter_type="dual_random_walk", max_diffusion_step=cfg.max_diffusion_step,
        num_nodes=cfg.num_nodes, num_rnn_layers=cfg.num_layers,
        rnn_units=cfg.rnn_units, input_dim=cfg.input_dim,
        output_dim=cfg.output_dim, horizon=cfg.horizon, seq_len=cfg.seq_len,
        use_curriculum_learning=False, dim_fc=cfg.dim_fc)
    feas = torch.from_numpy(np.asarray(node_feas, np.float32))
    adj_mx = torch.from_numpy(np.asarray(knn, np.float32))

    def prep(x, y):
        # traintest_GTS.py:57-74: (B,T,N,C) -> (T, B, N*C).
        x = torch.from_numpy(x[..., :cfg.input_dim].copy()).float()
        y = torch.from_numpy(y[..., :cfg.output_dim].copy()).float()
        x = x.permute(1, 0, 2, 3).reshape(cfg.seq_len, x.shape[0], -1)
        y = y.permute(1, 0, 2, 3).reshape(cfg.horizon, y.shape[0], -1)
        return x, y

    def batches(loader):
        for x, y in loader:
            yield prep(x, y)

    # init_model: one eval-mode forward materialises the lazy LayerParams
    # (traintest_GTS.py:47-54).
    with torch.no_grad():
        model.eval()
        for x, y in batches(data["val_loader"]):
            model(x, feas)
            break

    from megacrn_tpu.config import GTSConfig  # noqa: F401
    from megacrn_tpu.interop import gts_params_from_torch_state_dict

    init_state = gts_params_from_torch_state_dict(model.state_dict(), cfg)

    bce_loss = torch.nn.BCELoss()
    true_label = adj_mx.reshape(-1)

    def compute_loss(y, output):
        return masked_mae_loss(inv(output), inv(y))

    def evaluate(loader):
        with torch.no_grad():
            model.eval()
            losses_, maes, mapes, mses = [], [], [], []
            for x, y in batches(loader):
                output, mid = model(x, feas)
                loss1 = compute_loss(y, output)
                # Eval-side sigmoid quirk (traintest_GTS.py:119).
                loss_g = bce_loss(torch.sigmoid(mid.reshape(-1)), true_label)
                losses_.append(loss1.item() + loss_g.item())
                yp, yt = inv(output), inv(y)
                maes.append(masked_mae_loss(yp, yt).item())
                mapes.append(masked_mape_loss(yp, yt).item())
                mses.append(masked_mse_loss(yp, yt).item())
            return {"loss": float(np.mean(losses_)),
                    "mae": float(np.mean(maes)),
                    "mape": float(np.mean(mapes)),
                    "rmse": float(np.sqrt(np.mean(mses)))}

    optimizer = torch.optim.Adam(model.parameters(), lr=args.lr, eps=1e-3)
    min_val, batches_seen, traj = float("inf"), 0, []
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "gts.pt")
        for _ in range(args.epochs):
            model.train()
            for x, y in batches(data["train_loader"]):
                optimizer.zero_grad()
                output, mid = model(x, feas, y, batches_seen)
                loss1 = compute_loss(y, output)
                loss_g = bce_loss(mid.reshape(-1), true_label)
                loss = loss1 + loss_g
                batches_seen += 1
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
                optimizer.step()
            val = evaluate(data["val_loader"])
            traj.append(val)
            if val["loss"] < min_val:
                min_val = val["loss"]
                torch.save(model.state_dict(), ckpt)
        model.load_state_dict(torch.load(ckpt))
        test = evaluate(data["test_loader"])
    return init_state, {"val_trajectory": traj, "best_val": min_val,
                        "test": test}


def run_parity(args):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from megacrn_tpu.config import GTSConfig, TrainConfig
    from megacrn_tpu.data.datasets import build_from_series
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.data.synthetic import synthetic_speed_series
    from megacrn_tpu.train.gts_loop import fit_gts
    from megacrn_tpu.train.logs import RunDir

    values, index = synthetic_speed_series(args.steps, args.nodes, seed=5)
    # Pinned shuffle_rng: the loader's one-shot shuffle otherwise draws a
    # fresh OS-entropy generator per process, giving every run a different
    # batch ORDER — harmless for the continuous families, but GTS's
    # straight-through hard-argmax graph makes some orders amplify edge
    # flips past the CI tolerance (flaky test). Both sides still consume
    # the IDENTICAL loaders either way.
    data = build_from_series(values, index, seq_len=args.seq,
                             horizon=args.seq, batch_size=args.batch,
                             shuffle_rng=np.random.default_rng(11))
    series_len = int(args.steps * 0.7)
    # Normalized training series feeds the Conv1d extractor on both sides.
    train_feas = ((values[:series_len] - data["scaler_mean"])
                  / data["scaler_std"]).astype(np.float32)
    knn = cosine_knn_graph(train_feas, args.knn_k)
    cfg = GTSConfig(num_nodes=args.nodes, input_dim=2, output_dim=1,
                    horizon=args.seq, seq_len=args.seq,
                    rnn_units=args.units, num_layers=1,
                    max_diffusion_step=args.diffusion,
                    train_series_len=series_len, knn_k=args.knn_k,
                    use_curriculum_learning=False)
    tcfg = TrainConfig(batch_size=args.batch, epochs=args.epochs,
                       patience=args.epochs + 1, seed=0, lr=args.lr,
                       epsilon=1e-3, max_grad_norm=5.0)

    init_state, torch_res = run_torch(data, train_feas, knn, args, cfg)

    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        run = RunDir(td, "PARITYGTS", model_name="GTS",
                     snapshot_sources=False)
        jax_res = fit_gts(cfg, tcfg, data, train_feas, knn, run,
                          initial_state=init_state, gumbel_noise=False)
        jax_traj = []
        for line in open(run.metrics_path):
            rec = _json.loads(line)
            if "val" in rec:
                jax_traj.append({k: rec["val"][k]
                                 for k in ("loss", "mae", "mape", "rmse")})
    return {
        "config": {k: v for k, v in vars(args).items() if k != "report"},
        "torch": torch_res,
        "jax": {"val_trajectory": jax_traj, "best_val": jax_res["best_val"],
                "test": {k: jax_res["test_metrics"][k]
                         for k in ("mae", "mape", "rmse")}},
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--nodes", type=int, default=12)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--seq", type=int, default=6)
    p.add_argument("--units", type=int, default=8)
    p.add_argument("--diffusion", type=int, default=2)
    p.add_argument("--knn_k", type=int, default=3)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--report", action="store_true")
    a = p.parse_args()
    res = run_parity(a)
    print(json.dumps(res, indent=1))
    if a.report:
        from parity_train import record_and_report

        record_and_report(f"gts-N{a.nodes}", res)
