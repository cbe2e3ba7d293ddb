"""Dataset assembly: raw source -> loaders + scaler, per reference protocol.

Three sources:
* ``load_npz_splits`` — pre-windowed {train,val,test}.npz dirs in the
  reference layout (``model/traintest_MegaCRN.py:269-280``).
* ``build_from_series`` — a raw (T, N) series + datetime index, windowed and
  split in-process (what ``generate_training_data.py`` + npz loading do in
  two stages).
* ``build_synthetic`` — generated series (tests / benches / demos; the raw
  benchmark blobs are absent from the reference mirror).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from megacrn_tpu.data.loader import BatchLoader
from megacrn_tpu.data.scalers import StandardScaler
from megacrn_tpu.data.synthetic import synthetic_speed_series
from megacrn_tpu.data.windowing import chronological_split, generate_seq2seq_dataset


def _finalize(splits: Dict, batch_size: int, shuffle_rng=None,
              reshuffle_each_epoch: bool = False) -> Dict:
    """Scale channel 0 by train-x stats, build loaders
    (model/traintest_MegaCRN.py:274-280)."""
    x_train, _ = splits["train"]
    scaler = StandardScaler.fit(x_train[..., 0])
    data: Dict = {"scaler": scaler, "scaler_mean": scaler.mean,
                  "scaler_std": scaler.std}
    rng = shuffle_rng or np.random.default_rng()
    for cat in ["train", "val", "test"]:
        x, y = splits[cat]
        x = np.array(x, copy=True)
        y = np.array(y, copy=True)
        x[..., 0] = scaler.transform(x[..., 0])
        y[..., 0] = scaler.transform(y[..., 0])
        data[f"x_{cat}"], data[f"y_{cat}"] = x, y
        data[f"{cat}_loader"] = BatchLoader(
            x, y, batch_size, shuffle=(cat == "train"), rng=rng,
            reshuffle_each_epoch=reshuffle_each_epoch)
    return data


def load_npz_splits(data_dir: str, batch_size: int, **kw) -> Dict:
    splits = {}
    for cat in ["train", "val", "test"]:
        with np.load(os.path.join(data_dir, f"{cat}.npz")) as z:
            splits[cat] = (z["x"], z["y"])
    return _finalize(splits, batch_size, **kw)


def build_from_series(values: np.ndarray, index, seq_len: int, horizon: int,
                      batch_size: int, **kw) -> Dict:
    x, y = generate_seq2seq_dataset(values, index, seq_len, horizon)
    return _finalize(chronological_split(x, y), batch_size, **kw)


def build_synthetic(num_nodes: int = 32, num_steps: int = 2000,
                    seq_len: int = 12, horizon: int = 12,
                    batch_size: int = 64, interval_minutes: int = 5,
                    seed: int = 0, **kw) -> Dict:
    values, index = synthetic_speed_series(
        num_steps, num_nodes, interval_minutes, seed)
    return build_from_series(values, index, seq_len, horizon, batch_size, **kw)
