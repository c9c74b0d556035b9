"""Truthful device timing for remote-attached TPU runtimes.

Some TPU attachment paths (e.g. the experimental 'axon' remote platform)
acknowledge dispatches *without awaiting device completion* and deduplicate
byte-identical in-flight dispatches.  There, ``block_until_ready()``
wall-clock measures the client, not the chip — in both directions: a chained
1.1-TFLOP matmul "finished" in 0.06 ms (async ack), while genuine sub-ms
kernels inflate to the multi-ms tunnel latency (see BENCH.md methodology).

:func:`chained_rate` is the supported measurement primitive: K workload
steps chained inside one jitted ``lax.scan`` — step k's input depends on
step k-1's outputs, so nothing can be skipped, cached, or reordered —
ending in a host fetch of the dependent scalar (a transfer cannot complete
before the values exist), with two chain lengths differenced to cancel
fixed overhead.  Calibration on this environment: a chained 8192^3 matmul
measures 116 TF/s = 59% of v5e bf16 peak — physically sane.
"""

from __future__ import annotations

import sys
import time


def device_timing_is_trustworthy() -> bool:
    """False when naive wall-clock around ``block_until_ready`` may not
    reflect device execution time (any non-CPU backend: remote attachment,
    async dispatch, dedup — CPU is the only backend where the caller's
    thread provably waits for the compute)."""
    import jax

    return jax.default_backend() == "cpu"


def chained_rate(make_step, src, *consts, k_small=4, k_big=16, reps=3):
    """Seconds per step of ``make_step``, overhead-differenced.

    ``make_step(src_shifted, *consts)`` must return a scalar that depends on
    ALL of the step's outputs (so nothing is dead-code-eliminated).
    ``consts`` are jit ARGUMENTS — closure-captured concrete arrays make the
    remote compiler pathologically slow.  Every outer invocation gets a
    distinct src offset, so no two dispatches are byte-identical (defeats
    dispatch dedup).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def chain(K):
        @jax.jit
        def f(src, off, *consts):
            def body(carry, k):
                s = src + (carry * 1e-12 + (off + k.astype(jnp.float32)) * 1e-7)
                # cast keeps the carry dtype stable under jax_enable_x64
                return make_step(s, *consts).astype(jnp.float32), ()
            c, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return c
        return f

    times = {}
    call = 0
    for K in (k_small, k_big):
        f = chain(K)
        float(f(src, np.float32(1000 * call), *consts))  # compile + throwaway
        call += 1
        best = float("inf")
        for _ in range(reps):
            off = np.float32(1000 * call)  # distinct offsets: no dispatch is
            call += 1                      # ever byte-identical to another
            t0 = time.perf_counter()
            float(f(src, off, *consts))    # host fetch forces completion
            best = min(best, time.perf_counter() - t0)
        times[K] = best

    dt = (times[k_big] - times[k_small]) / (k_big - k_small)
    if dt <= 0:
        # jitter window swallowed the difference; fall back to the
        # conservative bound (fixed overhead charged to the steps)
        print(f"warning: chain differencing non-positive "
              f"({times[k_small]:.4f}s @K={k_small}, {times[k_big]:.4f}s "
              f"@K={k_big}); using K={k_big} mean", file=sys.stderr)
        dt = times[k_big] / k_big
    return dt
