"""MegaCRNx ablation variant: parity vs reference goldens."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from megacrn_tpu.models import megacrnx

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    blob = dict(np.load(os.path.join(GOLDEN_DIR, f"{name}.npz")))
    (n, cin, cout, horizon, seq_len, units, layers, cheb_k, ycov,
     mem_num, mem_dim, embed) = blob["meta/config"]
    memory_type, meta_type, step = blob["meta/flags"]
    cfg = megacrnx.MegaCRNxConfig(
        num_nodes=int(n), input_dim=int(cin), output_dim=int(cout),
        horizon=int(horizon), seq_len=int(seq_len), rnn_units=int(units),
        num_layers=int(layers), cheb_k=int(cheb_k), ycov_dim=int(ycov),
        mem_num=int(mem_num), mem_dim=int(mem_dim), embed_dim=int(embed),
        memory_type=bool(memory_type), meta_type=bool(meta_type),
        decoder_type="stepwise" if step else "sequence")

    def arr(k):
        return jnp.asarray(blob[k])

    params = {
        "node_embeddings": arr("node_embeddings"),
        "memory": {k: arr(f"memory/{k}") for k in ["Memory", "Wq", "FC_E"]},
        "encoder": [{
            "gate": {"W": arr("encoder/0/gate/W"), "b": arr("encoder/0/gate/b")},
            "update": {"W": arr("encoder/0/update/W"), "b": arr("encoder/0/update/b")},
        }],
        "decoder": [{
            "gate": {"W": arr("decoder/0/gate/W"), "b": arr("decoder/0/gate/b")},
            "update": {"W": arr("decoder/0/update/W"), "b": arr("decoder/0/update/b")},
        }],
        "proj": {"W": arr("proj/W"), "b": arr("proj/b")},
    }
    return cfg, params, blob


@pytest.mark.parametrize("name", ["megacrnx_mem_meta_step",
                                  "megacrnx_mem_nometa_seq",
                                  "megacrnx_mem_nometa_step"])
def test_megacrnx_matches_reference(name):
    cfg, params, blob = _load(name)
    out = megacrnx.forward(params, blob["in/x"], blob["in/y_cov"], cfg)
    np.testing.assert_allclose(np.asarray(out.query), blob["out/query"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.output), blob["out/output"],
                               atol=5e-5, rtol=1e-4)


def test_meta_without_memory_rejected():
    cfg = megacrnx.MegaCRNxConfig(num_nodes=5, rnn_units=4, mem_num=3,
                                  mem_dim=4, horizon=2, seq_len=2,
                                  memory_type=False, meta_type=True,
                                  cheb_k=2)
    import jax

    params = megacrnx.init_params(jax.random.PRNGKey(0), cfg)
    x = np.zeros((1, 2, 5, 1), np.float32)
    yc = np.zeros((1, 2, 5, 1), np.float32)
    with pytest.raises(ValueError):
        megacrnx.forward(params, x, yc, cfg)


def test_megacrnx_bfloat16_mode_tracks_f32():
    """compute_dtype="bfloat16" must track the f32 forward on identical
    weights (bf16 matmul-input noise only); the f32 default is unchanged."""
    import jax
    import jax.numpy as jnp

    from megacrn_tpu.models import megacrnx

    kw = dict(num_nodes=12, input_dim=1, output_dim=1, horizon=3, seq_len=4,
              rnn_units=8, mem_num=4, mem_dim=8)
    cfg32 = megacrnx.MegaCRNxConfig(**kw)
    cfg16 = megacrnx.MegaCRNxConfig(**kw, compute_dtype="bfloat16")
    params = megacrnx.init_params(jax.random.PRNGKey(0), cfg32)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (4, 4, 12, 1))
    ycov = jax.random.normal(ks[1], (4, 3, 12, 1))
    out32 = megacrnx.forward(params, x, ycov, cfg32)
    out16 = megacrnx.forward(params, x, ycov, cfg16)
    assert out16.output.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16.output),
                               np.asarray(out32.output), atol=0.05, rtol=0.1)
