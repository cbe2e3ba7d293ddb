"""CLI e2e: every capability must be reachable by flag (the reference bar is
"each harness script is a self-contained train->test program",
model/traintest_MegaCRN.py; here one CLI covers all backends/meshes)."""
import os

import numpy as np
import pytest

from megacrn_tpu.cli.traintest import main

BASE = ["--dataset", "SYNTH", "--num_nodes", "16", "--rnn_units", "8",
        "--mem_num", "4", "--mem_dim", "8", "--seq_len", "4",
        "--horizon", "4", "--epochs", "1", "--batch_size", "16",
        "--synth_steps", "200", "--seed", "0",
        "--test_every_epoch", "False"]


def _run(tmp_path, extra):
    result = main(BASE + ["--save_dir", str(tmp_path)] + extra)
    assert np.isfinite(result["test_metrics"]["mae"])
    return result


def test_cli_dense(tmp_path):
    _run(tmp_path, [])


def test_cli_road_sparse_backend(tmp_path):
    _run(tmp_path, ["--graph_backend", "road_sparse"])


def test_cli_sparse_meta_backend(tmp_path):
    _run(tmp_path, ["--graph_backend", "sparse_meta"])  # default: node impl


def test_cli_sparse_meta_block_impl(tmp_path):
    _run(tmp_path, ["--graph_backend", "sparse_meta",
                    "--sparse_meta_impl", "block"])


def test_cli_dense_ring_on_mesh(tmp_path):
    _run(tmp_path, ["--graph_backend", "dense_ring",
                    "--mesh_data", "2", "--mesh_node", "4"])


def test_cli_remat(tmp_path):
    _run(tmp_path, ["--remat"])


def test_cli_adj_path(tmp_path):
    from megacrn_tpu.data.synthetic import synthetic_road_adjacency

    adj = synthetic_road_adjacency(16, avg_degree=4, seed=5)
    adj_path = os.path.join(str(tmp_path), "adj01.npy")
    np.save(adj_path, adj)
    _run(tmp_path, ["--graph_backend", "road_sparse",
                    "--adj_path", adj_path])


def test_cli_sparse_backend_requires_adjacency(tmp_path):
    with pytest.raises(SystemExit):
        main(["--dataset", "METRLA", "--graph_backend", "road_sparse",
              "--data_dir", "does_not_exist", "--save_dir", str(tmp_path)])


def test_cli_road_sparse_node_partitioned_mesh(tmp_path):
    """--mesh_node > 1 with the Pallas backend routes through the
    node-partitioned ShardedRoadPacks path."""
    _run(tmp_path, ["--graph_backend", "road_sparse",
                    "--mesh_data", "2", "--mesh_node", "4"])


def test_cli_road_sparse_ell_node_partitioned_mesh(tmp_path):
    """--road_impl ell with --mesh_node > 1 routes through the node-level
    ELL ShardedNodeELL packs (the measured large-N backend) instead of the
    tile packs — fit trains node-partitioned, final eval on the plain pack."""
    _run(tmp_path, ["--graph_backend", "road_sparse", "--road_impl", "ell",
                    "--mesh_data", "2", "--mesh_node", "4"])
