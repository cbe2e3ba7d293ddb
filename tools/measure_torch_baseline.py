"""Measure the reference PyTorch implementation's train-step time in this
environment (CPU torch — no CUDA in the image), at the EXPY-TKY benchmark
configuration. Result is cached to tools/torch_baseline.json and used by
bench.py as the measured reference point for vs_baseline.

The reference protocol pins BLAS threads to 1
(model/traintest_MegaCRN.py:255-261); we measure both 1-thread (protocol
parity) and all-core settings and record the faster one as the baseline to
compare against (charitable to the reference).
"""
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference/model")
from MegaCRN import MegaCRN  # noqa: E402


def measure(num_threads: int, steps: int = 1):
    torch.set_num_threads(num_threads)
    n, t, units, mem_num, mem_dim, batch = 1843, 6, 32, 10, 32, 64
    model = MegaCRN(num_nodes=n, input_dim=1, output_dim=1, horizon=t,
                    rnn_units=units, mem_num=mem_num, mem_dim=mem_dim,
                    use_curriculum_learning=False)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, eps=1e-3)
    x = torch.randn(batch, t, n, 1)
    y = torch.randn(batch, t, n, 1)
    ycov = torch.randn(batch, t, n, 1)
    model.train()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        out, h_att, q, pos, neg = model(x, ycov, y, 0)
        loss = (torch.nn.functional.l1_loss(out, y)
                + 0.01 * torch.nn.TripletMarginLoss(margin=1.0)(
                    q, pos.detach(), neg.detach()))
        loss.backward()
        opt.step()
    return (time.time() - t0) / steps


def main():
    # The reference protocol pins 1 BLAS thread, but a 1-thread run exceeds
    # 5 min/step at this scale; measure all-core only (charitable baseline).
    res = {}
    res["sec_per_step_allcore"] = measure(os.cpu_count() or 8, steps=1)
    res["best_sec_per_step"] = res["sec_per_step_allcore"]
    res["config"] = {"num_nodes": 1843, "horizon": 6, "seq_len": 6,
                     "rnn_units": 32, "mem_num": 10, "mem_dim": 32,
                     "batch": 64, "device": "cpu",
                     "cpu_count": os.cpu_count()}
    path = os.path.join(os.path.dirname(__file__), "torch_baseline.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
