"""Activation parity vs committed reference goldens.

Fixtures in ``tests/goldens/`` were produced by ``tools/make_goldens.py``
running the reference PyTorch model on CPU (curriculum disabled, eval mode —
the only stochastic path is scheduled sampling, see SURVEY.md section 7.4).
"""
import os

import numpy as np
import pytest

import jax

from megacrn_tpu.config import MegaCRNConfig
from megacrn_tpu.interop import params_from_flat
from megacrn_tpu.models import megacrn

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name):
    blob = dict(np.load(os.path.join(GOLDEN_DIR, f"{name}.npz")))
    (num_nodes, input_dim, output_dim, horizon, seq_len, rnn_units,
     num_layers, cheb_k, ycov_dim, mem_num, mem_dim) = blob["meta/config"]
    cfg = MegaCRNConfig(
        num_nodes=int(num_nodes), input_dim=int(input_dim),
        output_dim=int(output_dim), horizon=int(horizon),
        seq_len=int(seq_len), rnn_units=int(rnn_units),
        num_layers=int(num_layers), cheb_k=int(cheb_k),
        ycov_dim=int(ycov_dim), mem_num=int(mem_num), mem_dim=int(mem_dim),
        use_curriculum_learning=False)
    params = params_from_flat(blob, cfg.num_layers)
    return cfg, params, blob


@pytest.mark.parametrize("name", ["megacrn_small", "megacrn_2layer",
                                  "megacrn_metrla"])
def test_forward_matches_reference(name):
    cfg, params, blob = load_golden(name)
    out = megacrn.forward(params, blob["in/x"], blob["in/y_cov"], cfg)
    np.testing.assert_allclose(
        np.asarray(out.query), blob["out/query"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.h_att), blob["out/h_att"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.pos), blob["out/pos"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.neg), blob["out/neg"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.output), blob["out/output"], atol=5e-5, rtol=1e-4)


def test_forward_jits_to_same_result():
    cfg, params, blob = load_golden("megacrn_small")
    import functools
    fwd = jax.jit(functools.partial(megacrn.forward, cfg=cfg))
    out = fwd(params, blob["in/x"], blob["in/y_cov"])
    np.testing.assert_allclose(
        np.asarray(out.output), blob["out/output"], atol=5e-5, rtol=1e-4)
