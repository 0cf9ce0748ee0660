"""Profiling and tracing hooks.

The reference's only instrumentation is a wall-clock print around the epoch
loop (reference poc/main.py:388,419-428). Here:

- :func:`trace` wraps a region in a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto);
- :class:`StepTimer` measures steady-state step time with a forced
  device-to-host sync (``jax.block_until_ready`` is not reliable on remote
  PJRT backends — a tiny transfer is);
- :func:`annotate` names a region for the device trace timeline.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the device timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def sync(x) -> float:
    """Force completion of ``x`` and return it as a python float (reliable
    sync even on remote backends where block_until_ready is lazy)."""
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


class StepTimer:
    """Median step-time measurement: run fn(state) repeatedly, sync each
    call, report median seconds and points/sec."""

    def __init__(self, points_per_step: int):
        self.points = points_per_step
        self.times: list[float] = []

    def measure(self, fn, state, reps: int = 5):
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(state)
            sync(out[1] if isinstance(out, tuple) else out)
            self.times.append(time.perf_counter() - t0)
        return out

    @property
    def median_s(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    @property
    def points_per_sec(self) -> float:
        return self.points / self.median_s
