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
