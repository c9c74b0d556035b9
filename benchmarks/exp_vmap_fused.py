"""On-chip A/B: the fused v2 cluster-search kernel under vmap.

The batched registration path (registration.py `_make_correspondence_fn`,
B > 1) pins ``fused=False`` because pallas_call-under-vmap was unvalidated
on the real chip when it shipped.  That pin sends the streaming pipeline's
windowed mode (B=window pairs per dispatch) to the slower XLA candidate
path.  This experiment checks compiled parity of the vmapped fused kernel
vs the vmapped XLA path and times both, on window-shaped inputs (B=8
independent 60k-point targets).

Run: timeout 590 python benchmarks/exp_vmap_fused.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chained_rate


def main():
    import jax
    import jax.numpy as jnp

    from dicp_tpu.ops.cluster_knn import build_cluster_index, cluster_nn

    B, n = 8, 61_440
    rng = np.random.default_rng(5)
    tgts = []
    for b in range(B):
        t = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        t[:, 2] = (np.sin(t[:, 0] * 0.35 + b) * np.cos(t[:, 1] * 0.3) * 2.0
                   + rng.normal(scale=0.02, size=n)).astype(np.float32)
        tgts.append(t)
    tgt = jnp.asarray(np.stack(tgts))
    src = jnp.asarray(np.stack(tgts)[:, rng.permutation(n)]
                      + rng.normal(scale=0.05, size=(B, n, 3)).astype(np.float32))

    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}", flush=True)

    index = jax.jit(jax.vmap(lambda t: build_cluster_index(t, 128)))(tgt)

    def query(fused):
        @jax.jit
        def f(pts, cent, rad, order, frame, q):
            from dicp_tpu.ops.cluster_knn import ClusterIndex

            def one(p, c, r, o, fr, qq):
                ix = ClusterIndex(p, c, r, o, fr)
                return cluster_nn(ix, qq, probes=32, fused=fused,
                                  use_pallas=False)
            return jax.vmap(one)(pts, cent, rad, order, frame, q)
        return f

    outs = {}
    for fused in (False, True):
        idx, d2, cert = query(fused)(index.points, index.centers, index.radius,
                                     index.order, index.frame, src)
        outs[fused] = (np.asarray(idx), np.asarray(d2), np.asarray(cert))
        print(f"fused={fused}: certified={outs[fused][2].mean()*100:.2f}%",
              flush=True)

    same = (outs[False][0] == outs[True][0]).mean()
    d2diff = np.abs(outs[False][1] - outs[True][1]).max()
    print(f"vmap parity fused-vs-XLA: idx agreement {same*100:.4f}%  "
          f"max|d2 diff| {d2diff:.3e}", flush=True)
    assert same == 1.0 and d2diff < 1e-5, "vmapped fused kernel DIVERGES on chip"

    for fused in (False, True):
        def step(q, pts, cent, rad, order, frame, fused=fused):
            from dicp_tpu.ops.cluster_knn import ClusterIndex

            def one(p, c, r, o, fr, qq):
                ix = ClusterIndex(p, c, r, o, fr)
                i, dd, _ = cluster_nn(ix, qq, probes=32, fused=fused,
                                      use_pallas=False)
                return jnp.sum(dd) + jnp.sum(i.astype(jnp.float32)) * 1e-9
            return jnp.sum(jax.vmap(one)(pts, cent, rad, order, frame, q))
        dt = chained_rate(step, src, index.points, index.centers, index.radius,
                          index.order, index.frame, k_small=2, k_big=5, reps=3)
        print(f"vmapped B={B} query 60k: fused={fused}: {dt*1e3:.2f} ms "
              f"({dt*1e3/B:.2f} ms/cloud)", flush=True)


if __name__ == "__main__":
    main()
