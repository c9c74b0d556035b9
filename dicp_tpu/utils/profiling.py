"""Profiling / observability helpers.

The reference's only timing artifact is a wall-clock print inside one test
(tests/test_ICP_inputs.py:79-103, SURVEY.md §5).  Here: a context manager
around ``jax.profiler`` for per-kernel TPU traces (viewable in TensorBoard /
xprof) and a steady-state benchmark helper that handles compile warmup and
device synchronization correctly.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): fn()``.

    Produces an xplane trace under ``log_dir`` with per-kernel timing
    (Pallas kernels show up under their pallas_call name).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(out):
    return jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)


def benchmark(fn: Callable, n: int = 10, warmup: int = 1) -> dict:
    """Steady-state timing of ``fn()`` (compile excluded).

    Returns {mean_s, min_s, compile_s, n}.
    """
    t0 = time.perf_counter()
    for _ in range(warmup):
        _block(fn())
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _block(fn())
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(times) / n,
        "min_s": min(times),
        "compile_s": compile_s,
        "n": n,
    }
