"""Native C++ host-pipeline: builds, matches numpy semantics, and is used
transparently by the windowing path."""
import numpy as np

from megacrn_tpu.data import native


def test_native_library_builds_and_loads():
    assert native.available(), "g++ build of native/_native.so failed"


def test_window_gather_matches_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(50, 7, 2).astype(np.float32)
    anchors = np.arange(11, 38)
    offsets = np.arange(-11, 1)
    got = native.window_gather(data, anchors, offsets)
    want = data[anchors[:, None] + offsets[None, :]]
    np.testing.assert_array_equal(got, want)


def test_index_gather_matches_numpy():
    rng = np.random.RandomState(1)
    src = rng.randn(40, 3, 4).astype(np.float32)
    idx = rng.permutation(40)[:17]
    np.testing.assert_array_equal(native.index_gather(src, idx), src[idx])


def test_scale_channel_inplace():
    rng = np.random.RandomState(2)
    data = rng.randn(10, 4, 3).astype(np.float32)
    want = data.copy()
    want[..., 0] = (want[..., 0] - 2.0) / 3.0
    native.scale_channel_inplace(data, 0, 2.0, 3.0)
    np.testing.assert_allclose(data, want, rtol=1e-6)


def test_prepare_xy_matches_python():
    from megacrn_tpu.data.loader import prepare_x_y

    rng = np.random.RandomState(3)
    x = rng.randn(4, 6, 5, 2).astype(np.float32)
    y = rng.randn(4, 6, 5, 2).astype(np.float32)
    gx, gy, gc = native.prepare_xy(x, y, 1, 1)
    wx, wy, wc = prepare_x_y(x, y, 1, 1)
    np.testing.assert_array_equal(gx, wx)
    np.testing.assert_array_equal(gy, wy)
    np.testing.assert_array_equal(gc, wc)
