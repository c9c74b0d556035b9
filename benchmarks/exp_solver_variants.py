"""One-off experiment: solver micro-variants on the headline B=256 workload.

Compares normal-equation solve method (closed vs lu), scan unroll, and the
three gradient paths.  Not part of the recorded bench suite.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift
    from dicp_tpu.registration import register

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data")
    scan = np.load(os.path.join(base, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(base, "points_map.npy")).astype(np.float32)
    B = 256
    src = jnp.asarray(np.stack([scan[:, :3]] * B))
    tgt = jnp.asarray(np.stack([mp] * B))
    ti = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))

    def cfg(**kw):
        return ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                         tolerance=1e-6, dim=2, trim_dist=5.0,
                         loss_name="huber", loss_metric=1.0, **kw)

    def timeit(step, n=20):
        out = step(src)
        jax.block_until_ready(out)
        # best-of-3 batches of n to damp tunnel jitter
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = step(src)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    variants = {
        "fwdbwd_lu_u1": jax.jit(jax.value_and_grad(
            lambda s: jnp.sum(register(s, tgt, ti, None, cfg(solve_method="lu")).T))),
        "fwdbwd_closed_u1": jax.jit(jax.value_and_grad(
            lambda s: jnp.sum(register(s, tgt, ti, None, cfg()).T))),
        "fwdbwd_closed_u4": jax.jit(jax.value_and_grad(
            lambda s: jnp.sum(register(s, tgt, ti, None, cfg(scan_unroll=4)).T))),
        "fwdbwd_ift_closed": jax.jit(jax.value_and_grad(
            lambda s: jnp.sum(register_ift(s, tgt, ti, None, cfg()).T))),
        "fwd_while_closed": jax.jit(
            lambda s: register(s, tgt, ti, None,
                               cfg(differentiable=False, driver="while")).T),
        "fwd_scan_closed": jax.jit(
            lambda s: register(s, tgt, ti, None, cfg()).T),
    }
    for name, step in variants.items():
        dt = timeit(step)
        print(f"{name:24s} {dt*1e3:8.2f} ms  {B/dt:9.0f} reg/s", flush=True)


if __name__ == "__main__":
    main()
