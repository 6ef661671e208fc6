"""Tracing & per-stage metrics (SURVEY.md par.5).

The reference's only instrumentation is the TicToc wall-clock timer,
compiled in but silent (include/tictoc.h:12-47).  Here profiling is
first-class: a stage timer that aggregates wall-clock stats per pipeline
stage (frames/sec/chip is the north-star metric), plus a thin wrapper over
jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Aggregating wall-clock timer: one row per pipeline stage."""

    def __init__(self):
        self._samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    def summary(self, skip_first: int = 1) -> dict:
        """Per-stage stats (seconds), skipping warmup/compile samples."""
        out = {}
        for name, xs in self._samples.items():
            xs = xs[skip_first:] if len(xs) > skip_first else xs
            a = np.asarray(xs)
            out[name] = {
                "n": len(a),
                "mean": float(a.mean()),
                "p50": float(np.percentile(a, 50)),
                "p95": float(np.percentile(a, 95)),
                "total": float(a.sum()),
            }
        return out

    def table(self, skip_first: int = 1) -> str:
        rows = ["stage                     n     mean     p50      p95    total"]
        for name, s in sorted(self.summary(skip_first).items(),
                              key=lambda kv: -kv[1]["total"]):
            rows.append(
                f"{name:<22} {s['n']:5d} {s['mean']*1e3:7.2f}ms "
                f"{s['p50']*1e3:7.2f}ms {s['p95']*1e3:7.2f}ms "
                f"{s['total']:7.2f}s")
        return "\n".join(rows)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
