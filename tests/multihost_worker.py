"""Subprocess worker for the real 2-process jax.distributed test.

Each rank: init the process group (parallel.multihost.initialize), build the
global (data=2, node=2) mesh over 2 processes x 2 local CPU devices, feed
its HALF of the global batch through host_local_batch_to_global, run ONE
GSPMD train step, and write the resulting loss to ``out_path``. The parent
test asserts both ranks produced the same loss AND that it equals the
single-process value on the full batch.

Argv: coordinator_address num_processes process_id fixtures_npz out_path
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Match the parent test harness (tests/conftest.py) so the loss is
    # bit-comparable to the single-process reference value.
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    coord, nprocs, pid, fixtures, out_path = sys.argv[1:6]
    nprocs, pid = int(nprocs), int(pid)

    from megacrn_tpu.parallel import multihost

    multihost.initialize(coord, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 2

    mesh = multihost.global_mesh(data=2, node=2)

    from megacrn_tpu.config import MegaCRNConfig, TrainConfig
    from megacrn_tpu.parallel.api import make_sharded_train_step
    from megacrn_tpu.train.optim import make_optimizer

    blob = np.load(fixtures, allow_pickle=True)
    cfg = MegaCRNConfig(num_nodes=8, rnn_units=8, mem_num=4, mem_dim=8,
                        horizon=3, seq_len=3)
    tcfg = TrainConfig(batch_size=int(blob["x"].shape[0]))
    # Params arrive pickled (a nested pytree) — identical on every rank.
    import pickle

    params = pickle.loads(blob["params_pkl"].tobytes())
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    opt_state = opt.init(params)

    # This rank's half of the global batch along the data axis: the mesh's
    # data axis spans processes (global_mesh row-majors jax.devices()).
    half = blob["x"].shape[0] // nprocs
    sl = slice(pid * half, (pid + 1) * half)
    x, y, ycov = (multihost.host_local_batch_to_global(
        mesh, (blob["x"][sl], blob["y"][sl], blob["ycov"][sl])))

    step = make_sharded_train_step(cfg, tcfg, opt, mesh, donate=False)
    _, _, loss = step(params, opt_state, x, y, ycov, 0.0,
                      jax.random.PRNGKey(2))
    with open(out_path, "w") as f:
        f.write(repr(float(loss)))


if __name__ == "__main__":
    main()
