"""CLI: train + test the GTS baseline (reference ``traintest_GTS.py``).

    python -m megacrn_tpu.cli.traintest_gts --dataset SYNTH --num_nodes 32
    python -m megacrn_tpu.cli.traintest_gts --dataset METRLA --data_dir ... \
        --raw_h5 METRLA/metr-la.h5

The graph learner needs the raw training series (``train_feas``) for its
Conv1d feature extractor and the cosine-kNN prior
(``traintest_GTS.py:324-333``); for npz datasets pass the raw series via
``--raw_h5``.
"""
from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="SYNTH")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--raw_h5", type=str, default=None,
                   help="raw (time x node) HDF5 for train_feas")
    p.add_argument("--save_dir", type=str, default="save")
    p.add_argument("--num_nodes", type=int, default=207)
    p.add_argument("--seq_len", type=int, default=12)
    p.add_argument("--horizon", type=int, default=12)
    p.add_argument("--input_dim", type=int, default=2)
    p.add_argument("--output_dim", type=int, default=1)
    p.add_argument("--rnn_units", type=int, default=64)
    p.add_argument("--num_rnn_layers", type=int, default=1)
    p.add_argument("--max_diffusion_step", type=int, default=3)
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--knn_k", type=int, default=10)
    p.add_argument("--base_lr", type=float, default=0.005)
    p.add_argument("--epsilon", type=float, default=1e-3)
    p.add_argument("--max_grad_norm", type=float, default=5.0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--cl_decay_steps", type=int, default=2000)
    p.add_argument("--use_curriculum_learning", type=lambda s: s == "True",
                   default=True)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--synth_steps", type=int, default=2000)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel mesh axis size (explicit shard_map "
                        "DP train step when > 1)")
    # trainval_ratio * (1 - val_ratio) = raw-series train fraction
    # (traintest_GTS.py:325: 0.8 * (1 - 0.125) = 0.7)
    p.add_argument("--train_frac", type=float, default=0.7)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from megacrn_tpu.config import GTSConfig, TrainConfig
    from megacrn_tpu.data import datasets
    from megacrn_tpu.data.graph_prior import cosine_knn_graph
    from megacrn_tpu.data.scalers import StandardScaler
    from megacrn_tpu.data.synthetic import synthetic_speed_series
    from megacrn_tpu.train.gts_loop import fit_gts
    from megacrn_tpu.train.logs import RunDir

    if args.dataset == "SYNTH":
        values, index = synthetic_speed_series(args.synth_steps,
                                               args.num_nodes)
        data = datasets.build_from_series(values, index, args.seq_len,
                                          args.horizon, args.batch_size)
        raw = values
    else:
        if args.data_dir is None or args.raw_h5 is None:
            raise SystemExit("--data_dir and --raw_h5 required")
        import pandas as pd

        data = datasets.load_npz_splits(args.data_dir, args.batch_size)
        raw = pd.read_hdf(args.raw_h5).values

    # train_feas: raw series train split, scaled by its own scaler
    # (traintest_GTS.py:324-328).
    train_feas = raw[: int(raw.shape[0] * args.train_frac)].astype(np.float32)
    scaler1 = StandardScaler.fit(train_feas)
    train_feas = scaler1.transform(train_feas)
    knn_prior = cosine_knn_graph(train_feas, args.knn_k)

    cfg = GTSConfig(
        num_nodes=args.num_nodes, input_dim=args.input_dim,
        output_dim=args.output_dim, horizon=args.horizon,
        seq_len=args.seq_len, rnn_units=args.rnn_units,
        num_layers=args.num_rnn_layers,
        max_diffusion_step=args.max_diffusion_step,
        temperature=args.temperature, cl_decay_steps=args.cl_decay_steps,
        use_curriculum_learning=args.use_curriculum_learning,
        train_series_len=train_feas.shape[0], knn_k=args.knn_k)
    tcfg = TrainConfig(lr=args.base_lr, epsilon=args.epsilon,
                       max_grad_norm=args.max_grad_norm, epochs=args.epochs,
                       patience=args.patience, batch_size=args.batch_size,
                       seed=args.seed)

    mesh = None
    if args.mesh_data > 1:
        from megacrn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, 1)

    run = RunDir(args.save_dir, args.dataset, model_name="GTS")
    result = fit_gts(cfg, tcfg, data, train_feas, knn_prior, run,
                     max_epochs=args.epochs, mesh=mesh)
    print(result["test_metrics"])
    return result


if __name__ == "__main__":
    main()
