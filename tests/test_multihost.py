"""REAL multi-process distributed init: two OS processes rendezvous via
jax.distributed.initialize on CPU, build the global (data, node) mesh with
parallel.multihost, feed per-host batch shards, and run one GSPMD train
step. This exercises the actual DCN-analog process-group path — not the
single-process virtual mesh the other sharding tests use."""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    import jax

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.models import megacrn
    from megacrn_tpu.train.optim import make_optimizer
    from megacrn_tpu.train.steps import make_train_step

    cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3)
    tcfg = TrainConfig(batch_size=8)
    params = megacrn.init_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = np.asarray(jax.random.normal(ks[0], (8, 3, 8, 1)), np.float32)
    y = np.asarray(jax.random.normal(ks[1], (8, 3, 8, 1)), np.float32)
    ycov = np.asarray(jax.random.normal(ks[2], (8, 3, 8, 1)), np.float32)

    fixtures = tmp_path / "fixtures.npz"
    np.savez(fixtures, x=x, y=y, ycov=ycov,
             params_pkl=np.frombuffer(
                 pickle.dumps(jax.device_get(params)), np.uint8))

    # Single-process reference value on the SAME full batch and params.
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    step = make_train_step(cfg, tcfg, opt, donate=False)
    _, _, ref_loss = step(params, opt.init(params), x, y, ycov, 0.0,
                          jax.random.PRNGKey(2))
    ref_loss = float(ref_loss)

    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"loss_{pid}.txt") for pid in (0, 1)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid), str(fixtures),
         outs[pid]], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    losses = [float(open(o).read()) for o in outs]
    assert np.isfinite(losses[0])
    # Both ranks observe the SAME global loss (it is psum'd/replicated)...
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # ...and it equals the single-process step on the full batch.
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)
