"""Benchmark: batched differentiable pt2pl ICP, forward+backward, B=256.

Reproduces the reference's headline configuration (BASELINE.md): the 65-point
test pair replicated to a 256-pair batch, dim=2, trim_dist=5.0, huber(1.0),
forward + gradient of sum(T) w.r.t. the source clouds.  Reference measured
~1293 registrations/s on 1 CPU core (torch 2.13, f64, tol=1e-10).

Headline path: implicit-function-theorem gradients (dicp_tpu.ift) — the
framework's designed fast gradient path (early-exit while_loop forward, one
6x6 adjoint solve backward, validated against unrolled-scan gradients in
tests/test_ift.py).  The unrolled-scan fwd+bwd and forward-only numbers are
printed to stderr for context.

Here: float32 on one TPU chip, tolerance 1e-6 (the f32-resolvable step norm;
the solver converges to the same transform within 5e-6).  Prints ONE JSON
line; detail goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_REG_PER_S = 1293.0  # BASELINE.md: pt2pl diff B=256 fwd+bwd, 1 CPU core


def _timeit(step, arg, n=20, reps=3):
    """Best-of-`reps` mean over `n` dispatches (damps tunnel jitter).

    Every call gets a distinct input (+k*1e-7, far below the solve
    tolerance): the axon remote-execution layer deduplicates identical
    in-flight dispatches, so repeating the same computation measures the
    cache, not the chip.
    """
    import jax
    import jax.numpy as jnp

    out = step(arg)
    jax.block_until_ready(out)
    best = float("inf")
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(arg + jnp.float32(k) * 1e-7)
            k += 1
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift
    from dicp_tpu.registration import register

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "data")
    scan = np.load(os.path.join(base, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(base, "points_map.npy")).astype(np.float32)

    B = 256
    source = jnp.asarray(np.stack([scan[:, :3]] * B))
    target = jnp.asarray(np.stack([mp]) * jnp.ones((B, 1, 1), jnp.float32))
    t_init = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))

    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    step_ift = jax.jit(jax.value_and_grad(
        lambda s: jnp.sum(register_ift(s, target, t_init, None, cfg).T)))
    step_unrolled = jax.jit(jax.value_and_grad(
        lambda s: jnp.sum(register(s, target, t_init, None,
                                   cfg.with_(scan_unroll=4)).T)))
    step_fwd = jax.jit(
        lambda s: register(s, target, t_init, None,
                           cfg.with_(differentiable=False, driver="while")).T)

    t0 = time.time()
    val, grad = step_ift(source)
    jax.block_until_ready((val, grad))
    print(f"compile: {time.time()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    dt = _timeit(step_ift, source)
    reg_per_s = B / dt
    print(f"IFT fwd+bwd B={B}: {dt*1e3:.2f} ms -> {reg_per_s:.0f} reg/s", file=sys.stderr)

    dt_u = _timeit(step_unrolled, source)
    print(f"unrolled fwd+bwd B={B}: {dt_u*1e3:.2f} ms -> {B/dt_u:.0f} reg/s", file=sys.stderr)
    dt_f = _timeit(step_fwd, source)
    print(f"forward-only (while) B={B}: {dt_f*1e3:.2f} ms -> {B/dt_f:.0f} reg/s", file=sys.stderr)

    # sanity: solution accurate and grads finite + IFT grad agrees with unrolled
    res_T = jax.jit(lambda s: register(s, target, t_init, None, cfg).T)(source)
    assert np.all(np.isfinite(np.asarray(res_T))), "non-finite transforms"
    assert np.all(np.isfinite(np.asarray(grad))), "non-finite grads"
    _, g_unrolled = step_unrolled(source)
    cos = float(jnp.sum(grad * g_unrolled) /
                (jnp.linalg.norm(grad) * jnp.linalg.norm(g_unrolled)))
    print(f"IFT vs unrolled grad cosine: {cos:.6f}", file=sys.stderr)
    assert cos > 0.99, f"IFT/unrolled gradient mismatch (cos={cos})"

    print(json.dumps({
        "metric": "pt2pl_diff_B256_fwdbwd_registrations_per_s",
        "value": round(reg_per_s, 1),
        "unit": "registrations/s/chip",
        "vs_baseline": round(reg_per_s / BASELINE_REG_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
