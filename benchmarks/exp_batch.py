"""Diagnose the B=4096 IFT throughput collapse (VERDICT round-2 #2).

Measures reg/s for the IFT fwd+bwd path and the forward-only while driver
at several batch sizes, with per-iteration histories collected vs skipped
(cfg.collect_histories).  Chained-scan timing per BENCH.md methodology.

Run: python benchmarks/exp_batch.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import chained_rate
from dicp_tpu.config import ICPConfig
from dicp_tpu.ift import register_ift
from dicp_tpu.registration import register

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data")


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    scan = np.load(os.path.join(BASE, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(BASE, "points_map.npy")).astype(np.float32)

    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    for B in (256, 1024, 4096):
        source = jnp.asarray(np.stack([scan[:, :3]] * B))
        target = jnp.asarray(np.stack([mp]) * jnp.ones((B, 1, 1), jnp.float32))
        t_init = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))

        for hist in (True, False):
            c = cfg.with_(collect_histories=hist)

            def ift_step(s, target, t_init, c=c):
                val, grad = jax.value_and_grad(
                    lambda x: jnp.sum(register_ift(x, target, t_init, None, c).T))(s)
                return val + jnp.sum(grad) * 1e-20

            def fwd_step(s, target, t_init, c=c):
                T = register(s, target, t_init, None,
                             c.with_(differentiable=False, driver="while")).T
                return jnp.sum(T)

            t0 = time.time()
            dt = chained_rate(ift_step, source, target, t_init)
            print(f"B={B:5d} hist={int(hist)} ift_fwdbwd: {dt*1e3:7.2f} ms "
                  f"-> {B/dt:9.0f} reg/s  (wall {time.time()-t0:.0f}s)",
                  flush=True)
            t0 = time.time()
            dt = chained_rate(fwd_step, source, target, t_init)
            print(f"B={B:5d} hist={int(hist)} fwd_while:  {dt*1e3:7.2f} ms "
                  f"-> {B/dt:9.0f} reg/s  (wall {time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
