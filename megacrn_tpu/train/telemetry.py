"""Observability: step timing, throughput accounting, profiler hooks.

The reference has only coarse per-epoch wall-clock (SURVEY.md section 5);
this module adds the TPU-native equivalents: a step timer with EMA and
edges/s derivation (the north-star metric), ``jax.profiler`` trace capture
around the jitted step, and compiled-program memory statistics.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def edge_traversals_per_step(num_nodes: int, cheb_k: int, seq_len: int,
                             horizon: int, batch: int,
                             num_supports: int = 2,
                             nnz: Optional[int] = None) -> int:
    """Forward-pass A@x edge traversals per train step (documented formula,
    see bench.py): nnz * (cheb_k-1) applications per support * 2 Chebyshev
    stacks per cell ([x||h] and z*h) * cells * batch."""
    nnz = nnz if nnz is not None else num_supports * num_nodes * num_nodes
    apps = cheb_k - 1
    stacks_per_cell = 2
    return nnz * apps * stacks_per_cell * (seq_len + horizon) * batch


class StepTimer:
    """Wall-clock per-step telemetry with EMA; call ``tick()`` after each
    synchronized step."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self.count = 0
        self._last = time.time()

    def tick(self) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt)
        self.count += 1
        return dt

    def stats(self, edges_per_step: Optional[int] = None) -> Dict:
        out = {"steps": self.count, "sec_per_step_ema": self.avg}
        if edges_per_step and self.avg:
            out["edges_per_sec"] = edges_per_step / self.avg
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/xprof) around a
    block of steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_memory_stats(compiled) -> Dict:
    """Memory analysis of a lowered+compiled step (argument/temp/output
    bytes) — run ``step.lower(...).compile()`` to obtain one."""
    m = compiled.memory_analysis()
    keys = ["argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "generated_code_size_in_bytes"]
    return {k: getattr(m, k, None) for k in keys}
