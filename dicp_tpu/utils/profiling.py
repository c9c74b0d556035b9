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


def benchmark(fn: Callable, n: int = 10, warmup: int = 1,
              force_wallclock: bool = False) -> dict:
    """Steady-state timing of ``fn()`` (compile excluded).

    Returns {mean_s, min_s, compile_s, n}.

    Refuses to run on non-CPU backends unless ``force_wallclock=True``:
    remote-attached TPU runtimes acknowledge dispatches without awaiting
    device completion and deduplicate identical dispatches, so
    ``block_until_ready`` wall-clock measures the *client*, not the chip
    (silently wrong in both directions — see BENCH.md).  Use
    :func:`dicp_tpu.utils.timing.chained_rate` for device-bound numbers.
    """
    from dicp_tpu.utils.timing import device_timing_is_trustworthy

    if not device_timing_is_trustworthy() and not force_wallclock:
        raise RuntimeError(
            "benchmark() times block_until_ready wall-clock, which does not "
            "reflect device execution on this backend (remote/async "
            "dispatch).  Use dicp_tpu.utils.timing.chained_rate (chained "
            "lax.scan + host fetch + overhead differencing), or pass "
            "force_wallclock=True to measure the client anyway.")
    if warmup < 1:
        # warmup=0 would fold XLA compilation into the first timed
        # iteration while reporting compile_s ~ 0 — silently wrong in a
        # module whose purpose is truthful timing (code-review r3)
        raise ValueError("benchmark() needs warmup >= 1: the first call "
                         "pays compilation and must not be timed")
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
