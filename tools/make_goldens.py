"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs the reference model (``/root/reference/model/MegaCRN.py``) on CPU with a
fixed seed, extracts its weights into the megacrn-tpu parameter layout, and
saves weights + inputs + activations + loss values to
``tests/goldens/*.npz``. The committed fixtures let the test suite verify
bit-level math parity without importing torch or the reference at test time.

Usage:  python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

REF = os.environ.get("MEGACRN_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REF, "model"))

from MegaCRN import MegaCRN  # noqa: E402  (reference, runtime-only dependency)
import utils as ref_utils  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def flatten_params(model: MegaCRN, num_layers: int) -> dict:
    """Map the torch state_dict onto the megacrn-tpu pytree layout.

    AGCN weights are (in, out) in both implementations (the reference stores a
    raw Parameter applied via einsum 'bni,io->bno', model/MegaCRN.py:11,27).
    Only the nn.Linear projection needs a transpose (torch stores (out, in)).
    """
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {}
    for name in ["Memory", "Wq", "We1", "We2"]:
        out[f"memory/{name}"] = sd[f"memory.{name}"]
    for mod in ["encoder", "decoder"]:
        for i in range(num_layers):
            for sub in ["gate", "update"]:
                out[f"{mod}/{i}/{sub}/W"] = sd[f"{mod}.dcrnn_cells.{i}.{sub}.weights"]
                out[f"{mod}/{i}/{sub}/b"] = sd[f"{mod}.dcrnn_cells.{i}.{sub}.bias"]
    out["proj/W"] = sd["proj.0.weight"].T
    out["proj/b"] = sd["proj.0.bias"]
    return out


def make_model_golden(name: str, *, num_nodes, input_dim, output_dim, horizon,
                      seq_len, rnn_units, num_layers, cheb_k, ycov_dim,
                      mem_num, mem_dim, batch):
    torch.manual_seed(7)
    np.random.seed(7)
    model = MegaCRN(num_nodes=num_nodes, input_dim=input_dim,
                    output_dim=output_dim, horizon=horizon,
                    rnn_units=rnn_units, num_layers=num_layers,
                    cheb_k=cheb_k, ycov_dim=ycov_dim, mem_num=mem_num,
                    mem_dim=mem_dim, use_curriculum_learning=False)
    model.eval()

    x = np.random.randn(batch, seq_len, num_nodes, input_dim).astype(np.float32)
    y_cov = np.random.randn(batch, horizon, num_nodes, ycov_dim).astype(np.float32)

    with torch.no_grad():
        output, h_att, query, pos, neg = model(
            torch.from_numpy(x), torch.from_numpy(y_cov))

    blob = flatten_params(model, num_layers)
    blob.update({
        "in/x": x, "in/y_cov": y_cov,
        "out/output": output.numpy(), "out/h_att": h_att.numpy(),
        "out/query": query.numpy(), "out/pos": pos.numpy(),
        "out/neg": neg.numpy(),
        "meta/config": np.array([num_nodes, input_dim, output_dim, horizon,
                                 seq_len, rnn_units, num_layers, cheb_k,
                                 ycov_dim, mem_num, mem_dim]),
    })
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}: output shape {output.shape}")


def make_loss_goldens():
    rng = np.random.RandomState(3)
    pred = rng.randn(4, 6, 10, 1).astype(np.float32) * 10 + 50
    true = rng.randn(4, 6, 10, 1).astype(np.float32) * 10 + 50
    true[rng.rand(*true.shape) < 0.15] = 0.0  # missing values
    tp, tt = torch.from_numpy(pred), torch.from_numpy(true)

    anchor = rng.randn(4, 10, 8).astype(np.float32)
    posv = rng.randn(4, 10, 8).astype(np.float32)
    negv = rng.randn(4, 10, 8).astype(np.float32)

    blob = {
        "in/pred": pred, "in/true": true,
        "out/masked_mae_loss": ref_utils.masked_mae_loss(tp, tt).numpy(),
        "out/masked_mape_loss": ref_utils.masked_mape_loss(tp, tt).numpy(),
        "out/masked_mse_loss": ref_utils.masked_mse_loss(tp, tt).numpy(),
        "out/masked_rmse_loss": ref_utils.masked_rmse_loss(tp, tt).numpy(),
        "out/masked_mae_nullval": ref_utils.masked_mae(tp, tt, 1e-3).numpy(),
        "out/masked_mape_nullval": ref_utils.masked_mape(tp, tt, 1e-3).numpy(),
        "out/masked_mse_nullval": ref_utils.masked_mse(tp, tt, 1e-3).numpy(),
        "in/anchor": anchor, "in/posv": posv, "in/negv": negv,
        "out/triplet": F.triplet_margin_loss(
            torch.from_numpy(anchor), torch.from_numpy(posv),
            torch.from_numpy(negv), margin=1.0).numpy(),
        "out/mse_plain": F.mse_loss(
            torch.from_numpy(anchor), torch.from_numpy(posv)).numpy(),
    }
    path = os.path.join(OUT_DIR, "losses.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    make_model_golden(
        "megacrn_small", num_nodes=16, input_dim=1, output_dim=1, horizon=4,
        seq_len=4, rnn_units=8, num_layers=1, cheb_k=3, ycov_dim=1,
        mem_num=5, mem_dim=8, batch=3)
    make_model_golden(
        "megacrn_2layer", num_nodes=12, input_dim=2, output_dim=1, horizon=3,
        seq_len=5, rnn_units=6, num_layers=2, cheb_k=2, ycov_dim=2,
        mem_num=4, mem_dim=6, batch=2)
    # METR-LA-shaped config (full default dims, small batch) — the strongest
    # single parity check.
    make_model_golden(
        "megacrn_metrla", num_nodes=207, input_dim=1, output_dim=1, horizon=12,
        seq_len=12, rnn_units=64, num_layers=1, cheb_k=3, ycov_dim=1,
        mem_num=20, mem_dim=64, batch=2)
    make_loss_goldens()


if __name__ == "__main__":
    main()
