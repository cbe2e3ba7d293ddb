"""Architecture smoke entry: build the model, run a dummy jitted forward,
print the trainable-parameter table — the analog of ``python MegaCRN.py``
(``model/MegaCRN.py:207-226``, the reference's only shape test).

    python -m megacrn_tpu.cli.summary --num_variable 207 --rnn_units 64
    python -m megacrn_tpu.cli.summary --model MEGACRNX --decoder sequence
"""
from __future__ import annotations

import argparse


def print_params_table(params) -> int:
    """print_params parity (model/MegaCRN.py:196-205): name, shape, numel."""
    import jax

    count = 0
    print("Trainable parameter list:")
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        print(name, tuple(leaf.shape), leaf.size)
        count += int(leaf.size)
    print(f"In total: {count} trainable parameters. \n")
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="MEGACRN",
                   choices=["MEGACRN", "MEGACRNX", "GTS"])
    p.add_argument("--num_variable", type=int, default=207)
    p.add_argument("--his_len", type=int, default=12)
    p.add_argument("--seq_len", type=int, default=12)
    p.add_argument("--channelin", type=int, default=1)
    p.add_argument("--channelout", type=int, default=1)
    p.add_argument("--rnn_units", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--memory", type=lambda s: s == "True", default=True)
    p.add_argument("--meta", type=lambda s: s == "True", default=True)
    p.add_argument("--decoder", type=str, default="stepwise",
                   choices=["sequence", "stepwise"])
    args = p.parse_args(argv)

    import jax
    import numpy as np

    key = jax.random.PRNGKey(0)
    x = np.random.randn(args.batch, args.his_len, args.num_variable,
                        args.channelin).astype(np.float32)
    ycov = np.random.randn(args.batch, args.seq_len, args.num_variable,
                           1).astype(np.float32)

    if args.model == "MEGACRN":
        from megacrn_tpu.config import MegaCRNConfig
        from megacrn_tpu.models import megacrn

        cfg = MegaCRNConfig(num_nodes=args.num_variable,
                            input_dim=args.channelin,
                            output_dim=args.channelout,
                            horizon=args.seq_len, seq_len=args.his_len,
                            rnn_units=args.rnn_units)
        params = megacrn.init_params(key, cfg)
        out = jax.jit(lambda p, x, yc: megacrn.forward(p, x, yc, cfg).output)(
            params, x, ycov)
    elif args.model == "MEGACRNX":
        from megacrn_tpu.models import megacrnx

        cfg = megacrnx.MegaCRNxConfig(
            num_nodes=args.num_variable, input_dim=args.channelin,
            output_dim=args.channelout, horizon=args.seq_len,
            seq_len=args.his_len, rnn_units=args.rnn_units,
            memory_type=args.memory, meta_type=args.meta,
            decoder_type=args.decoder)
        params = megacrnx.init_params(key, cfg)
        out = jax.jit(
            lambda p, x, yc: megacrnx.forward(p, x, yc, cfg).output)(
            params, x, ycov)
    else:
        from megacrn_tpu.config import GTSConfig
        from megacrn_tpu.models import gts

        cfg = GTSConfig(num_nodes=args.num_variable,
                        input_dim=args.channelin,
                        output_dim=args.channelout, horizon=args.seq_len,
                        seq_len=args.his_len, rnn_units=args.rnn_units,
                        train_series_len=100)
        params, bn_state = gts.init_params(key, cfg)
        feas = np.random.randn(100, args.num_variable).astype(np.float32)
        out = jax.jit(
            lambda p, s, x, f: gts.forward(p, s, x, f, cfg).output)(
            params, bn_state, x, feas)

    print(f"forward output shape: {tuple(out.shape)}")
    print_params_table(params)


if __name__ == "__main__":
    main()
