"""Reference-checkpoint import: .pt state_dict -> params pytree -> identical
forward outputs (the migration path for users of the reference repo)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("MEGACRN_REFERENCE", "/root/reference")


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                    reason="reference repo not mounted")
def test_torch_checkpoint_import_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REF, "model"))
    from MegaCRN import MegaCRN  # reference, runtime-only

    from megacrn_tpu.config import MegaCRNConfig
    from megacrn_tpu.interop import params_from_torch_checkpoint
    from megacrn_tpu.models import megacrn

    torch.manual_seed(5)
    cfg = MegaCRNConfig(num_nodes=9, rnn_units=6, mem_num=3, mem_dim=5,
                        horizon=2, seq_len=3, use_curriculum_learning=False)
    model = MegaCRN(num_nodes=9, input_dim=1, output_dim=1, horizon=2,
                    rnn_units=6, mem_num=3, mem_dim=5,
                    use_curriculum_learning=False)
    path = os.path.join(tmp_path, "ref.pt")
    torch.save(model.state_dict(), path)

    params = params_from_torch_checkpoint(path, num_layers=1)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 9, 1).astype(np.float32)
    ycov = rng.randn(2, 2, 9, 1).astype(np.float32)
    model.eval()
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(ycov))[0].numpy()
    got = np.asarray(megacrn.forward(params, x, ycov, cfg).output)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                    reason="reference repo not mounted")
def test_gts_state_dict_import(tmp_path):
    import types
    sys.modules.setdefault(
        "torchsummary", types.SimpleNamespace(summary=lambda *a, **k: None))
    sys.path.insert(0, os.path.join(REF, "model"))
    import GTS as ref_gts

    from megacrn_tpu.config import GTSConfig
    from megacrn_tpu.interop import gts_params_from_torch_state_dict
    from megacrn_tpu.models import gts

    torch.manual_seed(9)
    cfg = GTSConfig(num_nodes=8, input_dim=2, output_dim=1, horizon=2,
                    seq_len=3, rnn_units=5, max_diffusion_step=2,
                    train_series_len=40, use_curriculum_learning=False)
    model = ref_gts.GTSModel(
        gpu=0, temperature=0.5, cl_decay_steps=2000,
        filter_type="dual_random_walk", horizon=2, input_dim=2,
        max_diffusion_step=2, num_nodes=8, num_rnn_layers=1, output_dim=1,
        rnn_units=5, seq_len=3, use_curriculum_learning=False,
        dim_fc=16 * (40 - 18))
    rng = np.random.RandomState(0)
    feas = rng.randn(40, 8).astype(np.float32)
    x_flat = rng.randn(3, 2, 8 * 2).astype(np.float32)
    ref_gts.sample_gumbel = lambda device, shape, eps=1e-20: torch.zeros(shape)
    model.eval()
    with torch.no_grad():
        model(torch.from_numpy(x_flat), torch.from_numpy(feas))  # lazy init
        want, _ = model(torch.from_numpy(x_flat), torch.from_numpy(feas))

    params, bn_state = gts_params_from_torch_state_dict(model.state_dict(),
                                                        cfg)
    x = x_flat.reshape(3, 2, 8, 2).transpose(1, 0, 2, 3)
    out = gts.forward(params, bn_state, x, feas, cfg, training=False,
                      gumbel_noise=False)
    want_r = want.numpy().reshape(2, 2, 8, 1).transpose(1, 0, 2, 3)
    np.testing.assert_allclose(np.asarray(out.output), want_r,
                               atol=5e-5, rtol=1e-4)
