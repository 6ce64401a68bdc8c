"""Profiling / tracing hooks (SURVEY.md §5 tracing row).

The reference has wall-clock AverageMeters only (train_utils.py:27-30) and a
thop FLOPs counter (common_utils.cal_flops). TPU-native: `jax.profiler`
xplane traces (viewable in XProf/TensorBoard), a step-timer context, and an
analytic FLOPs estimate via jax.stage/cost analysis.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (xplane) for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock p50/p90 tracker with device sync."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        import numpy as np

        if not self.times:
            return {}
        t = np.asarray(self.times) * 1e3
        return {
            "p50_ms": float(np.percentile(t, 50)),
            "p90_ms": float(np.percentile(t, 90)),
            "mean_ms": float(t.mean()),
            "n": len(t),
        }


def cost_analysis(fn, *args):
    """Analytic FLOPs / bytes for a jitted fn (thop cal_flops equivalent,
    common_utils.py:305-312 — but exact, from XLA's cost model)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "flops": ca.get("flops", float("nan")),
        "bytes_accessed": ca.get("bytes accessed", float("nan")),
    }
