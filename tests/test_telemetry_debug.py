"""Telemetry and debug-mode subsystems."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megacrn_tpu.train.debug import checkified, finite_tree, grad_global_norm
from megacrn_tpu.train.telemetry import (StepTimer, compiled_memory_stats,
                                         edge_traversals_per_step)


def test_edge_traversal_formula_matches_bench():
    # Must equal bench.py's accounting for the EXPY-TKY config.
    n, k, t, h, b = 1843, 3, 6, 6, 64
    want = (2 * n * n) * (k - 1) * 2 * (t + h) * b
    assert edge_traversals_per_step(n, k, t, h, b) == want


def test_step_timer_accumulates():
    t = StepTimer(ema=0.5)
    t.tick()
    t.tick()
    s = t.stats(edges_per_step=1000)
    assert s["steps"] == 2 and s["sec_per_step_ema"] > 0
    assert s["edges_per_sec"] > 0


def test_checkified_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = checkified(bad)
    assert np.isfinite(float(safe(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        safe(jnp.asarray(-1.0))


def test_finite_tree_reports_offender():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    ok, bad = finite_tree(tree)
    assert not ok and bad == ["b/c"]


def test_grad_global_norm():
    g = {"w": jnp.asarray([3.0, 4.0])}
    np.testing.assert_allclose(float(grad_global_norm(g)), 5.0, rtol=1e-6)


def test_compiled_memory_stats():
    f = jax.jit(lambda x: x @ x)
    compiled = f.lower(jnp.ones((64, 64))).compile()
    stats = compiled_memory_stats(compiled)
    assert "temp_size_in_bytes" in stats
