"""Minimal on-chip compile probe for ops/fused_gn (stage-split).

Stage 1: compile + run the raw kernel at tiny shapes/iterations.
Stage 2: grow to the headline shape (B=256, n=m=65, T=100).
Prints timestamps around each stage so a stalled remote compile is visible.

Run: timeout 590 python -u benchmarks/exp_fused_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ops.fused_gn import fused_gn_solve

    stamp(f"backend={jax.default_backend()} dev={jax.devices()[0]}")

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    scan = np.load(os.path.join(base, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(base, "points_map.npy")).astype(np.float32)
    n, m = scan.shape[0], mp.shape[0]
    stamp(f"pair n={n} m={m}")

    stages = [
        dict(B=8, T=3, label="tiny"),
        dict(B=8, T=100, label="T100"),
        dict(B=256, T=100, label="headline"),
    ]
    for st in stages:
        B, T = st["B"], st["T"]
        cfg = ICPConfig(icp_type="pt2pl", differentiable=True,
                        driver="while", max_iterations=T, tolerance=1e-6,
                        dim=2, trim_dist=5.0, loss_name="huber",
                        loss_metric=1.0)
        src = jnp.asarray(np.stack([scan[:, :3]] * B))
        tgt = jnp.asarray(np.stack([mp] * B))
        w = jnp.ones((B, n), jnp.float32)
        C0 = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * B))
        r0 = jnp.zeros((B, 3), jnp.float32)
        stamp(f"{st['label']}: compiling fused_gn_solve B={B} T={T} ...")
        t0 = time.time()
        out = fused_gn_solve(src, tgt, w, C0, r0, cfg, interpret=False)
        got = [np.asarray(o) for o in out]
        stamp(f"{st['label']}: done in {time.time()-t0:.1f}s  "
              f"iters={got[3][:4]} conv={got[2][:4]} "
              f"C00={got[0][0,0,0]:.6f} r0={got[1][0]}")
        assert np.all(np.isfinite(got[0])), "non-finite C"


if __name__ == "__main__":
    main()
