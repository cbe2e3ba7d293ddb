"""Generate MegaCRNx ablation-variant parity fixtures from the reference
(model_futurework/MegaCRNx.py). Deterministic: MegaCRNx has no curriculum or
sampling. Usage: python tools/make_megacrnx_goldens.py"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch

REF = os.environ.get("MEGACRN_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REF, "model_futurework"))

from MegaCRNx import MegaCRN as RefX  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def flatten(model, num_layers):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {"node_embeddings": sd["node_embeddings"]}
    for name in ["Memory", "Wq", "FC_E"]:
        out[f"memory/{name}"] = sd[f"memory.{name}"]
    for mod in ["encoder", "decoder"]:
        for i in range(num_layers):
            for sub in ["gate", "update"]:
                out[f"{mod}/{i}/{sub}/W"] = sd[f"{mod}.dcrnn_cells.{i}.{sub}.weights"]
                out[f"{mod}/{i}/{sub}/b"] = sd[f"{mod}.dcrnn_cells.{i}.{sub}.bias"]
    out["proj/W"] = sd["proj.0.weight"].T
    out["proj/b"] = sd["proj.0.bias"]
    return out


def make(name, memory_type, meta_type, decoder_type):
    torch.manual_seed(21)
    np.random.seed(21)
    n, cin, cout, horizon, seq_len, units = 11, 1, 1, 3, 4, 6
    model = RefX(num_nodes=n, input_dim=cin, output_dim=cout, horizon=horizon,
                 rnn_units=units, num_layers=1, embed_dim=5, cheb_k=2,
                 ycov_dim=1, mem_num=4, mem_dim=6, memory_type=memory_type,
                 meta_type=meta_type, decoder_type=decoder_type)
    model.eval()
    x = np.random.randn(2, seq_len, n, cin).astype(np.float32)
    y_cov = np.random.randn(2, horizon, n, 1).astype(np.float32)
    with torch.no_grad():
        out, h_att, query, pos, neg = model(
            torch.from_numpy(x), torch.from_numpy(y_cov))
    blob = flatten(model, 1)
    blob.update({
        "in/x": x, "in/y_cov": y_cov, "out/output": out.numpy(),
        "out/query": query.numpy(),
        "meta/flags": np.array([int(memory_type), int(meta_type),
                                0 if decoder_type == "sequence" else 1]),
        "meta/config": np.array([n, cin, cout, horizon, seq_len, units,
                                 1, 2, 1, 4, 6, 5]),
    })
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}: {out.shape}")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    make("megacrnx_mem_meta_step", True, True, "stepwise")
    make("megacrnx_mem_nometa_seq", True, False, "sequence")
    make("megacrnx_mem_nometa_step", True, False, "stepwise")


if __name__ == "__main__":
    main()
