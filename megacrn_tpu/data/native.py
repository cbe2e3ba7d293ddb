"""ctypes bindings for the native host-pipeline library (native/megacrn_data.cc).

Auto-builds ``_native.so`` with g++ on first use if missing; every entry has
a numpy fallback, so the package works without a toolchain (``available()``
reports which path is active).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build() -> bool:
    src = os.path.join(_SRC_DIR, "megacrn_data.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-pthread", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.mcrn_window_gather.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64, i64p, ctypes.c_int64, f32p]
    lib.mcrn_index_gather.argtypes = [
        f32p, ctypes.c_int64, i64p, ctypes.c_int64, f32p]
    lib.mcrn_scale_channel.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float]
    lib.mcrn_prepare_xy.argtypes = [f32p, f32p] + [ctypes.c_int64] * 6 + [
        f32p, f32p, f32p]
    lib.mcrn_version.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def window_gather(data: np.ndarray, anchors: np.ndarray,
                  offsets: np.ndarray) -> np.ndarray:
    """data (T, N, C) -> (S, W, N, C) windows; native or numpy fallback."""
    data = np.ascontiguousarray(data, np.float32)
    anchors = np.ascontiguousarray(anchors, np.int64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lib = _load()
    t, n, c = data.shape
    if lib is None:
        return data[anchors[:, None] + offsets[None, :]]
    out = np.empty((len(anchors), len(offsets), n, c), np.float32)
    lib.mcrn_window_gather(data.reshape(t, -1), n * c, anchors, len(anchors),
                           offsets, len(offsets), out.reshape(len(anchors),
                                                              len(offsets), -1))
    return out


def index_gather(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """src (S, ...) -> (len(indices), ...) row gather."""
    src = np.ascontiguousarray(src, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    lib = _load()
    if lib is None:
        return src[indices]
    row = int(np.prod(src.shape[1:]))
    out = np.empty((len(indices),) + src.shape[1:], np.float32)
    lib.mcrn_index_gather(src.reshape(len(src), -1), row, indices,
                          len(indices), out.reshape(len(indices), -1))
    return out


def scale_channel_inplace(data: np.ndarray, channel: int, mean: float,
                          std: float) -> None:
    """In-place (x - mean) / std on data[..., channel]; data float32."""
    assert data.dtype == np.float32 and data.flags.c_contiguous
    lib = _load()
    c = data.shape[-1]
    count = data.size // c
    if lib is None:
        data[..., channel] = (data[..., channel] - mean) / std
        return
    lib.mcrn_scale_channel(data.reshape(-1), count, c, channel,
                           ctypes.c_float(mean), ctypes.c_float(1.0 / std))


def prepare_xy(x: np.ndarray, y: np.ndarray, input_dim: int, output_dim: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused prepare_x_y (channel split) — native or numpy."""
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    lib = _load()
    if lib is None:
        return (x[..., :input_dim], y[..., :output_dim],
                np.ascontiguousarray(y[..., output_dim:]))
    b, t, n, c = x.shape
    x0 = np.empty((b, t, n, input_dim), np.float32)
    y0 = np.empty((b, t, n, output_dim), np.float32)
    ycov = np.empty((b, t, n, c - output_dim), np.float32)
    lib.mcrn_prepare_xy(x, y, b, t, n, c, input_dim, output_dim, x0, y0, ycov)
    return x0, y0, ycov
