"""Data pipeline semantics: windowing, splits, scalers, loader padding."""
import numpy as np

from megacrn_tpu.data.expytky import (clamp_speeds, get_seq_windows,
                                      scale_months, window_xy)
from megacrn_tpu.data.loader import BatchLoader, prepare_x_y
from megacrn_tpu.data.scalers import ColumnScaler, StandardScaler, fit_columnwise
from megacrn_tpu.data.synthetic import synthetic_speed_series
from megacrn_tpu.data.windowing import (chronological_split,
                                        generate_seq2seq_dataset,
                                        window_series)


def test_window_series_matches_reference_loop():
    t, n, c = 50, 4, 2
    data = np.random.RandomState(0).randn(t, n, c)
    x_offsets = np.arange(-11, 1)
    y_offsets = np.arange(1, 13)
    x, y = window_series(data, x_offsets, y_offsets)
    # Reference loop (generate_training_data.py:44-50).
    min_t, max_t = 11, t - 12
    assert x.shape[0] == max_t - min_t
    for i, anchor in enumerate(range(min_t, max_t)):
        np.testing.assert_array_equal(x[i], data[anchor + x_offsets])
        np.testing.assert_array_equal(y[i], data[anchor + y_offsets])


def test_seq2seq_dataset_channel_stack():
    values, index = synthetic_speed_series(100, 5, interval_minutes=5)
    x, y = generate_seq2seq_dataset(values, index, seq_len=12, horizon=12)
    assert x.shape[1:] == (12, 5, 2) and y.shape[1:] == (12, 5, 2)
    # Channel 1 is fraction-of-day in [0, 1).
    assert 0 <= x[..., 1].min() and x[..., 1].max() < 1.0


def test_chronological_split_rounding():
    x = np.arange(100)[:, None, None, None].repeat(2, 1)
    y = x.copy()
    s = chronological_split(x, y)
    assert len(s["train"][0]) == 70 and len(s["test"][0]) == 20
    assert len(s["val"][0]) == 10
    # Chronological: val follows train, test is the tail.
    assert s["val"][0][0, 0, 0, 0] == 70 and s["test"][0][0, 0, 0, 0] == 80


def test_loader_pads_to_batch_multiple_with_last_sample():
    xs = np.arange(10)[:, None].astype(float)
    loader = BatchLoader(xs, xs, batch_size=4)
    assert loader.size == 12 and len(loader) == 3
    batches = list(loader)
    np.testing.assert_array_equal(batches[-1][0][-2:], [[9.0], [9.0]])
    assert loader.true_size == 10


def test_loader_parity_shuffle_is_fixed_across_epochs():
    xs = np.arange(32)[:, None].astype(float)
    loader = BatchLoader(xs, xs, 8, shuffle=True,
                         rng=np.random.default_rng(0))
    e1 = np.concatenate([b[0] for b in loader])
    e2 = np.concatenate([b[0] for b in loader])
    np.testing.assert_array_equal(e1, e2)


def test_loader_reshuffle_each_epoch_differs():
    xs = np.arange(64)[:, None].astype(float)
    loader = BatchLoader(xs, xs, 8, shuffle=True, reshuffle_each_epoch=True,
                         rng=np.random.default_rng(0))
    e1 = np.concatenate([b[0] for b in loader])
    e2 = np.concatenate([b[0] for b in loader])
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1, 0), np.sort(e2, 0))


def test_prepare_x_y_channel_split():
    x = np.random.randn(4, 12, 5, 2)
    y = np.random.randn(4, 12, 5, 2)
    x0, y0, ycov = prepare_x_y(x, y, input_dim=1, output_dim=1)
    np.testing.assert_array_equal(x0[..., 0], x[..., 0].astype(np.float32))
    np.testing.assert_array_equal(ycov[..., 0], y[..., 1].astype(np.float32))
    assert x0.shape[-1] == 1 and ycov.shape[-1] == 1


def test_standard_scaler_roundtrip_and_population_std():
    data = np.random.RandomState(1).randn(100, 3) * 7 + 3
    s = StandardScaler.fit(data)
    np.testing.assert_allclose(s.std, data.std(), rtol=1e-6)  # ddof=0
    np.testing.assert_allclose(s.inverse_transform(s.transform(data)), data,
                               rtol=1e-6)


def test_expytky_clamp_and_windows():
    d = np.array([[-5.0], [250.0], [100.0]])
    c = clamp_speeds(d)
    np.testing.assert_array_equal(c[:, 0], [0.0, 100.0, 100.0])

    data = np.arange(10)[:, None, None].astype(float)
    w = get_seq_windows(data, 4)
    assert w.shape == (7, 4, 1, 1)
    np.testing.assert_array_equal(w[0, :, 0, 0], [0, 1, 2, 3])

    xs, ys = window_xy([data], his_len=3, seq_len=2)
    assert xs.shape[1] == 3 and ys.shape[1] == 2
    np.testing.assert_array_equal(xs[0, :, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(ys[0, :, 0, 0], [3, 4])


def test_expytky_scaling_modes():
    rng = np.random.RandomState(0)
    train = [rng.rand(20, 4, 1) * 100, rng.rand(20, 4, 1) * 100]
    test = [rng.rand(10, 4, 1) * 100]
    tr_leak, te_leak, sc_leak = scale_months(train, test, fit_on="train+test")
    tr_clean, _, sc_clean = scale_months(train, test, fit_on="train")
    assert not np.allclose(sc_leak.mean, sc_clean.mean)
    # Leak-parity mode: stats over vstacked train+test.
    all_mat = np.vstack([m[..., 0] for m in train + test])
    np.testing.assert_allclose(sc_leak.mean, all_mat.mean(0), rtol=1e-6)
    np.testing.assert_allclose(
        sc_leak.inverse_transform(tr_leak[0][..., 0]), train[0][..., 0],
        rtol=1e-5)


def test_weekday_time_feature_normalized():
    from megacrn_tpu.data.windowing import weekday_time_feature

    index = (np.datetime64("2012-03-05") +
             np.arange(2016) * np.timedelta64(5, "m"))  # one full week
    f = weekday_time_feature(index, num_nodes=3, interval_minutes=5)
    assert f.shape == (2016, 3, 1)
    np.testing.assert_allclose(f.max(), 1.0, rtol=1e-6)
    assert f.min() == 0.0  # Monday 00:00 slot


def test_one_hot_time_feature_layout():
    from megacrn_tpu.data.windowing import one_hot_time_feature

    index = (np.datetime64("2021-10-01T00:00") +
             np.arange(144) * np.timedelta64(10, "m"))
    f = one_hot_time_feature(index)
    assert f.shape == (144, 38)
    np.testing.assert_array_equal(f[:, :7].sum(1), 1)  # weekday one-hot
    np.testing.assert_array_equal(f[:, 7:31].sum(1), 1)  # hour one-hot
    np.testing.assert_array_equal(f[:, 31:37].sum(1), 1)  # interval one-hot
    # 2021-10-01 is a Friday: not a weekend holiday by default.
    assert f[0, -1] == 0.0
    f2 = one_hot_time_feature(index, holiday_fn=lambda ts: True)
    assert np.all(f2[:, -1] == 1.0)


def test_load_pickle_latin1_fallback(tmp_path):
    """model/utils.py:162-172 semantics: plain pickles load directly;
    python2-era latin1 payloads load through the encoding fallback."""
    import pickle

    from megacrn_tpu.data.loader import load_pickle

    plain = tmp_path / "plain.pkl"
    with open(plain, "wb") as f:
        pickle.dump({"adj": [1, 2, 3]}, f)
    assert load_pickle(str(plain))["adj"] == [1, 2, 3]

    legacy = tmp_path / "legacy.pkl"
    with open(legacy, "wb") as f:
        # protocol 0 with non-ascii STRING (not unicode) bytes — the
        # python2 pickle shape that trips the default decoder.
        f.write(b"S'\xe9\xe9'\np0\n.")
    assert load_pickle(str(legacy)) == "\xe9\xe9"


def test_one_hot_time_feature_calendar_injection():
    """A date-specific calendar (the jpholiday stand-in) flags exactly its
    holidays, OR'd with weekends — the reference semantics
    (model_EXPYTKY/utils.py:122: jpholiday | saturday | sunday)."""
    from megacrn_tpu.data.windowing import one_hot_time_feature

    # 2021-10-04 (Mon) .. 2021-10-10 (Sun), one sample per day.
    index = (np.datetime64("2021-10-04T00:00") +
             np.arange(7) * np.timedelta64(1, "D"))
    calendar = lambda ts: ts.strftime("%Y-%m-%d") == "2021-10-06"
    f = one_hot_time_feature(index, holiday_fn=calendar)
    # Wednesday the 6th via the calendar; Sat/Sun via the weekend OR.
    np.testing.assert_array_equal(f[:, -1], [0, 0, 1, 0, 0, 1, 1])
