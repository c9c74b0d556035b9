"""On-chip A/B for the whole-solve fused GN kernel (ops/fused_gn).

Measures the headline IFT fwd+bwd step (bench.py config) with the fused
kernel ON (auto on TPU) vs OFF, plus forward-only, and checks parity of the
fused solve against the XLA while driver on the real chip (interpret-mode
parity is already pinned in tests/test_fused_gn.py; Mosaic compilation can
diverge).  Also A/Bs the batch-tile size bt.

Run: timeout 590 python benchmarks/exp_fused_gn.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chained_rate


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift
    from dicp_tpu.registration import register
    from dicp_tpu.ops.fused_gn import fused_gn_solve, fused_eligible

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    scan = np.load(os.path.join(base, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(base, "points_map.npy")).astype(np.float32)

    B = 256
    source = jnp.asarray(np.stack([scan[:, :3]] * B))
    target = jnp.asarray(np.stack([mp]) * jnp.ones((B, 1, 1), jnp.float32))
    t_init = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))

    # collect_histories=False: fused_eligible REQUIRES it (the default True
    # made every "fused ON" row silently measure the XLA path — the A/B
    # would have gated the auto flip on vacuous numbers)
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0,
                    collect_histories=False)
    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}",
          file=sys.stderr, flush=True)

    # --- parity on chip: fused vs XLA while driver (non-chained, one shot)
    cfg_w = cfg.with_(differentiable=True, driver="while")
    elig = fused_eligible(cfg_w.with_(fused_small=True), source, target, None)
    print("eligible(forced):", elig, flush=True)
    assert elig, "fused kernel not eligible — the A/B below would be vacuous"
    rf = jax.jit(lambda s: register(
        s, target, t_init, None, cfg_w.with_(fused_small=True)).T)(source)
    rx = jax.jit(lambda s: register(
        s, target, t_init, None, cfg_w.with_(fused_small=False)).T)(source)
    rf, rx = np.asarray(rf), np.asarray(rx)
    derr = np.abs(rf - rx).max()
    print(f"on-chip parity fused-vs-XLA |T| max abs diff: {derr:.3e}",
          flush=True)
    assert derr < 1e-4, "on-chip fused parity FAILED"

    # --- headline IFT fwd+bwd, fused OFF vs ON
    def make_ift_step(fused):
        c = cfg.with_(fused_small=fused)
        def step(s, target, t_init):
            val, grad = jax.value_and_grad(
                lambda x: jnp.sum(register_ift(x, target, t_init, None, c).T))(s)
            return val + jnp.sum(grad) * 1e-20
        return step

    for fused in (False, True):
        t0 = time.time()
        dt = chained_rate(make_ift_step(fused), source, target, t_init)
        print(f"IFT fwd+bwd B={B} fused={fused}: {dt*1e3:.3f} ms "
              f"({B/dt:.0f} reg/s) [{time.time()-t0:.0f}s incl compile]",
              flush=True)

    # --- forward-only solve, fused OFF vs ON (isolates the kernel itself)
    def make_fwd(fused):
        c = cfg.with_(differentiable=False, driver="while", fused_small=fused)
        def step(s, target, t_init):
            return jnp.sum(register(s, target, t_init, None, c).T)
        return step

    for fused in (False, True):
        dt = chained_rate(make_fwd(fused), source, target, t_init)
        print(f"forward-only B={B} fused={fused}: {dt*1e3:.3f} ms "
              f"({B/dt:.0f} reg/s)", flush=True)

    # --- bt sweep on the raw kernel (preprocessed tensors, direct call)
    from dicp_tpu.registration import _preprocess
    src_p, tgt_p, w_p, C0, r0 = _preprocess(cfg_w, source, target, t_init, None)
    w_pt = w_p  # pt2pl: per-point already
    for bt in (8, 16, 32, 64):
        def step(s, tgt_p, w_pt, C0, r0):
            out = fused_gn_solve(s[..., :3], tgt_p, w_pt, C0, r0,
                                 cfg_w, interpret=False, bt=bt)
            return sum(jnp.sum(o) * 1e-6 for o in out[:2])
        try:
            dt = chained_rate(step, src_p, tgt_p, w_pt, C0, r0)
            print(f"raw fused solve bt={bt}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # VMEM blowup etc.
            print(f"raw fused solve bt={bt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
