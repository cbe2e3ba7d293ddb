"""Generate GTS parity fixtures from the reference implementation.

The GTS forward is stochastic even in eval (Gumbel noise in the graph
sampler, ``model/GTS.py:228-235``), so goldens are produced with the noise
patched to zero; the megacrn-tpu side uses ``gumbel_noise=False`` to match.

Usage: python tools/make_gts_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch

REF = os.environ.get("MEGACRN_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REF, "model"))

# The reference imports torchsummary at module top (GTS.py:6) but only uses it
# in main(); stub it (not installed in this image).
import types  # noqa: E402

sys.modules.setdefault(
    "torchsummary", types.SimpleNamespace(summary=lambda *a, **k: None))

import GTS as ref_gts  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def flatten_params(model, num_layers: int, cfg: dict) -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {}
    out["conv1/W"], out["conv1/b"] = sd["conv1.weight"], sd["conv1.bias"]
    out["conv2/W"], out["conv2/b"] = sd["conv2.weight"], sd["conv2.bias"]
    for fc in ["fc", "fc_out", "fc_cat"]:
        out[f"{fc}/W"] = sd[f"{fc}.weight"].T
        out[f"{fc}/b"] = sd[f"{fc}.bias"]
    for i, bn in enumerate(["bn1", "bn2", "bn3"], 1):
        out[f"{bn}/scale"] = sd[f"{bn}.weight"]
        out[f"{bn}/bias"] = sd[f"{bn}.bias"]
        out[f"{bn}/mean"] = sd[f"{bn}.running_mean"]
        out[f"{bn}/var"] = sd[f"{bn}.running_var"]
    units = cfg["rnn_units"]
    k1 = cfg["max_diffusion_step"] + 1
    for mod, tag in [("encoder_model", "encoder"), ("decoder_model", "decoder")]:
        in_dim = cfg["input_dim"] if tag == "encoder" else cfg["output_dim"]
        for i in range(num_layers):
            layer_in = in_dim if i == 0 else units
            gshape = ((layer_in + units) * k1, 2 * units)
            cshape = ((layer_in + units) * k1, units)
            p = f"{mod}.dcgru_layers.{i}"
            out[f"{tag}/{i}/gate/W"] = sd[f"{p}.gconv_weight_{gshape}"]
            out[f"{tag}/{i}/gate/b"] = sd[f"{p}.gconv_biases_{2 * units}"]
            out[f"{tag}/{i}/candidate/W"] = sd[f"{p}.gconv_weight_{cshape}"]
            out[f"{tag}/{i}/candidate/b"] = sd[f"{p}.gconv_biases_{units}"]
    out["proj/W"] = sd["decoder_model.projection_layer.weight"].T
    out["proj/b"] = sd["decoder_model.projection_layer.bias"]
    return out


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(11)
    np.random.seed(11)

    cfg = dict(num_nodes=10, input_dim=2, output_dim=1, horizon=3, seq_len=4,
               rnn_units=6, num_rnn_layers=1, max_diffusion_step=2,
               temperature=0.5, train_series_len=60)
    dim_fc = 16 * (cfg["train_series_len"] - 18)
    model = ref_gts.GTSModel(
        gpu=0, temperature=cfg["temperature"], cl_decay_steps=2000,
        filter_type="dual_random_walk", horizon=cfg["horizon"],
        input_dim=cfg["input_dim"], max_diffusion_step=cfg["max_diffusion_step"],
        num_nodes=cfg["num_nodes"], num_rnn_layers=cfg["num_rnn_layers"],
        output_dim=cfg["output_dim"], rnn_units=cfg["rnn_units"],
        seq_len=cfg["seq_len"], use_curriculum_learning=False, dim_fc=dim_fc)

    # Lazy LayerParams: materialise weights with a dry forward first
    # (traintest_GTS.py:47-55), then re-seed-free golden forward.
    b, t, n, c = 2, cfg["seq_len"], cfg["num_nodes"], cfg["input_dim"]
    node_feas = np.random.randn(cfg["train_series_len"], n).astype(np.float32)
    x = np.random.randn(t, b, n * c).astype(np.float32)

    # Patch Gumbel noise to zero for determinism.
    ref_gts.sample_gumbel = lambda device, shape, eps=1e-20: torch.zeros(shape)

    model.eval()
    with torch.no_grad():
        model(torch.from_numpy(x), torch.from_numpy(node_feas))  # materialise
        out, adj_prob = model(torch.from_numpy(x), torch.from_numpy(node_feas))

    blob = flatten_params(model, cfg["num_rnn_layers"], cfg)
    blob.update({
        "in/x": x, "in/node_feas": node_feas,
        "out/output": out.numpy(), "out/adj_prob": adj_prob.numpy(),
        "meta/config": np.array([cfg["num_nodes"], cfg["input_dim"],
                                 cfg["output_dim"], cfg["horizon"],
                                 cfg["seq_len"], cfg["rnn_units"],
                                 cfg["num_rnn_layers"],
                                 cfg["max_diffusion_step"],
                                 cfg["train_series_len"]]),
    })
    path = os.path.join(OUT_DIR, "gts_small.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}: output {out.shape}")


if __name__ == "__main__":
    main()
