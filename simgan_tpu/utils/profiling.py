"""Profiling / tracing utilities (an aux subsystem the reference lacks).

The reference's only perf signal is the FPS log line (SURVEY §5).  Here:
  * ``trace(path)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/Perfetto trace of the jitted programs;
  * ``StepTimer`` — cheap wall-clock step timing with EMA, for the training
    loops' FPS lines;
  * ``annotate`` — TraceAnnotation wrapper to label pipeline phases
    (rollout / discriminator / ppo) inside device traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg = None
        self._last = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        self._last = now
        return dt

    @property
    def avg(self) -> float | None:
        return self._avg

    def rate(self, units_per_step: float) -> float | None:
        return None if not self._avg else units_per_step / self._avg
