"""Host-side monotonic timing around device work.

The observability analogue of the reference's PROFILING timers
(src/utils.c:729-763, include/utils.h:28-47): solve/setup wall time is
measured host-side around ``block_until_ready``; per-lane iteration/node
counts are carried in the solver state itself.
"""
from __future__ import annotations

import time

import numpy as np


def _now():
    return np.float64(time.perf_counter())


def now_callback():
    """Traced host wall-clock read (for the in-loop time-limit check,
    reference daqp.c:95-103).  Only traced when a time limit is set."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback
    return io_callback(_now, jax.ShapeDtypeStruct((), jnp.float64),
                       ordered=False)


class Timer:
    """tic/toc monotonic timer (CLOCK_MONOTONIC equivalent)."""

    def __init__(self):
        self._start = None
        self.elapsed = 0.0

    def tic(self):
        self._start = time.perf_counter()
        return self

    def toc(self) -> float:
        self.elapsed = time.perf_counter() - self._start
        return self.elapsed

    def __enter__(self):
        return self.tic()

    def __exit__(self, *exc):
        self.toc()
        return False
