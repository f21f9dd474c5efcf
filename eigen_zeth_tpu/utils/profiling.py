"""Profiling / tracing hooks — the observability layer.

The reference's tracing story is env_logger + reth's RethTracer spans
(SURVEY.md §5); the TPU framework's equivalent is the JAX profiler
(XPlane traces viewable in TensorBoard/Perfetto) plus the roofline
reports in utils/roofline.py.

Usage:
    with profile_trace("/tmp/ezt-trace"):
        prover.gen_chunk_proof(...)
or set EZT_PROFILE_DIR to trace every BatchProver phase.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def profile_trace(log_dir: str | None = None):
    """JAX profiler trace around a block (no-op if profiling unavailable)."""
    import jax

    log_dir = log_dir or os.environ.get("EZT_PROFILE_DIR")
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class Metrics:
    """Process-local counters/timers (the prometheus-socket analog of the
    reference's --metrics flag, src/commands/reth.rs:48-49)."""

    def __init__(self):
        self.counters: dict[str, int] = {}
        self.timings: dict[str, list[float]] = {}

    def inc(self, name: str, by: int = 1):
        self.counters[name] = self.counters.get(name, 0) + by

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.timings.setdefault(name, []).append(time.time() - t0)

    def report(self) -> dict:
        return {
            "counters": dict(self.counters),
            "timings": {
                k: {"count": len(v), "total_s": sum(v), "mean_s": sum(v) / len(v)}
                for k, v in self.timings.items()
                if v
            },
        }


METRICS = Metrics()
