"""Headline-throughput experiments: B=256 pt2pl IFT fwd+bwd variants.

At B=256 x 65 points the per-iteration tensors are tiny; the early-exit
while_loop pays per-step sequencing overhead.  Candidates:

  a) baseline: while-driver forward (current headline)
  b) const-iter scan forward, unrolled (no convergence branches at all)
  c) b + collect_histories=False
  d) b at B=1024
  e) forward-only versions of a/b for attribution

Run: python benchmarks/exp_headline.py
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


def inputs(B):
    scan = np.load(os.path.join(BASE, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(BASE, "points_map.npy")).astype(np.float32)
    return (jnp.asarray(np.stack([scan[:, :3]] * B)),
            jnp.asarray(np.stack([mp] * B)),
            jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B)))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)
    # 8 fixed iterations: the pair converges in 7 (bench history); extra
    # iterations are no-ops at the fixed point
    cfg_fix = cfg.with_(const_iter=True, max_iterations=8, driver="scan",
                        scan_unroll=8)

    variants = []
    for B in (256, 1024):
        src, tgt, ti = inputs(B)

        def ift_step(s, tgt, ti, c):
            val, grad = jax.value_and_grad(
                lambda x: jnp.sum(register_ift(x, tgt, ti, None, c).T))(s)
            return val + jnp.sum(grad) * 1e-20

        def fwd_step(s, tgt, ti, c):
            return jnp.sum(register(s, tgt, ti, None, c).T)

        for name, c, fn in (
            (f"a_ift_while_B{B}", cfg, ift_step),
            (f"b_ift_fixed8_B{B}", cfg_fix, ift_step),
            (f"c_ift_fixed8_nohist_B{B}",
             cfg_fix.with_(collect_histories=False), ift_step),
            (f"e1_fwd_while_B{B}",
             cfg.with_(differentiable=False, driver="while"), fwd_step),
            (f"e2_fwd_fixed8_B{B}",
             cfg_fix.with_(differentiable=False), fwd_step),
        ):
            variants.append((name, B, c, fn, src, tgt, ti))

    # accuracy guard: fixed-8 T must match while T
    from dicp_tpu.registration import register_jit
    src, tgt, ti = inputs(8)
    T_w = register_jit(src, tgt, ti, None,
                       cfg=cfg.with_(differentiable=False, driver="while")).T
    T_f = register_jit(src, tgt, ti, None,
                       cfg=cfg_fix.with_(differentiable=False)).T
    gap = float(jnp.max(jnp.abs(T_w - T_f)))
    print(f"fixed8 vs while T gap: {gap:.2e}", flush=True)

    for name, B, c, fn, src, tgt, ti in variants:
        t0 = time.time()
        try:
            dt = chained_rate(lambda s, tg, t: fn(s, tg, t, c), src, tgt, ti)
            print(f"{name}: {dt*1e3:7.2f} ms -> {B/dt:9.0f} reg/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
