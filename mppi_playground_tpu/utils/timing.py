"""Solve-time measurement and profiling hooks.

The reference measures wall-clock around the solve and prints an average
(``/root/reference/example/navigation2d.py:34-37,69-70``).  We provide the
same plus correct async-dispatch timing (``jax.block_until_ready``) and
``jax.profiler`` trace capture for TPU performance work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


class SolveTimer:
    """Running average of solve latency (reference-style reporting)."""

    def __init__(self) -> None:
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_fn: Callable = None):
        """Time a block; pass ``result_fn`` returning the block's output so
        the async JAX dispatch is synced before the clock stops."""
        start = time.perf_counter()
        yield
        if result_fn is not None:
            jax.block_until_ready(result_fn())
        self.times.append(time.perf_counter() - start)

    def add(self, seconds: float) -> None:
        self.times.append(seconds)

    @property
    def average_ms(self) -> float:
        return 1000.0 * float(np.mean(self.times)) if self.times else 0.0

    def summary(self) -> str:
        return f"average solve time: {self.average_ms:.3f} ms"


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 20, **kwargs) -> Dict:
    """Measure steady-state latency of a jitted fn with correct sync.

    Returns dict with mean/p50/p95 seconds and calls/s.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - start)
    times = np.asarray(times)
    return {
        "mean_s": float(times.mean()),
        "p50_s": float(np.percentile(times, 50)),
        "p95_s": float(np.percentile(times, 95)),
        "per_s": float(1.0 / times.mean()),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
