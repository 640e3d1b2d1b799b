"""Tracing / profiling hooks (SURVEY.md §5: the reference has none — only
wall-clock ETA strings; this adds first-class observability).

- ``trace(log_dir)``: capture a jax.profiler trace viewable in
  TensorBoard's profile plugin / Perfetto.
- ``StepTimer``: per-step wall-clock EMA + items/sec, cheap enough to run
  every step (reads happen host-side after the async dispatch).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema=0.9):
        self._ema = ema
        self._avg = None
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, items=1):
        dt = time.perf_counter() - self._last
        self._avg = dt if self._avg is None else \
            self._ema * self._avg + (1 - self._ema) * dt
        return dt, items / dt if dt > 0 else float("inf")

    @property
    def avg_seconds(self):
        return self._avg
