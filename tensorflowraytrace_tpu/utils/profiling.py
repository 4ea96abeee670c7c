"""Profiling helpers.

The reference's only observability is timeit wall-clocks
(dev/performance.py:77-86) and print statements (SURVEY.md section 5).
Here: a context manager around jax.profiler for xprof/TensorBoard traces,
plus a tiny wall-clock tracker for step loops.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir="/tmp/tfrt_tpu_profile", enabled=True):
    """Capture an xprof trace of the enclosed block::

        with profile_trace("/tmp/prof"):
            run_step(...)
        # inspect with: tensorboard --logdir /tmp/prof   (or xprof)
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock stats for step loops (replaces the reference's
    ad-hoc time.time() bracketing, optimizer.py:388-442)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def total(self):
        return sum(self.times)

    def report(self, label="step"):
        n = len(self.times)
        return (f"{n} {label}s in {self.total:.3f}s "
                f"({1e3 * self.mean:.2f} ms/{label})")
