"""Block-scattered cluster_nn: on-chip timing + dense-case accuracy/cert.

Run: python benchmarks/exp_cluster3.py
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
from dicp_tpu.ops.cluster_knn import (build_cluster_index, cluster_knn,
                                      cluster_nn)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n = 100_000
    y = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))

    from dicp_tpu.ops.pallas_knn import nn_indices_pallas
    ref = nn_indices_pallas(x, y, interpret=False)

    for gsz, P in ((128, 16), (128, 32), (256, 16), (256, 24)):
        index = jax.jit(lambda t, gsz=gsz: build_cluster_index(t, gsz))(y)
        idx, d2, cert = cluster_nn(index, x, probes=P)
        agree = float(jnp.mean((idx == ref).astype(jnp.float32)))
        certp = float(jnp.mean(cert.astype(jnp.float32)))
        print(f"g={gsz} P={P}: agree {agree:.6f} cert {certp:.4f}", flush=True)

        def q_step(xx, pts, c, r, o, fr, gsz=gsz, P=P):
            from dicp_tpu.ops.cluster_knn import ClusterIndex
            ix = ClusterIndex(pts, c, r, o, fr)
            idx, d2, cert = cluster_nn(ix, xx, probes=P)
            return (jnp.sum(idx.astype(jnp.float32)) * 1e-9
                    + jnp.sum(d2) * 1e-20 + jnp.sum(cert) * 1e-9)

        t0 = time.time()
        dt = chained_rate(jax.jit(q_step), x, index.points, index.centers,
                          index.radius, index.order, index.frame,
                          k_small=2, k_big=8)
        print(f"   query: {dt*1e3:6.2f} ms (wall {time.time()-t0:.0f}s)",
              flush=True)

    # k-NN for the normals path
    index = jax.jit(lambda t: build_cluster_index(t, 128))(y)

    def knn_step(xx, pts, c, r, o, fr):
        from dicp_tpu.ops.cluster_knn import ClusterIndex
        ix = ClusterIndex(pts, c, r, o, fr)
        idx, d2, cert = cluster_knn(ix, xx, k=16, probes=16)
        return (jnp.sum(idx.astype(jnp.float32)) * 1e-9
                + jnp.sum(d2) * 1e-20 + jnp.sum(cert) * 1e-9)

    t0 = time.time()
    dt = chained_rate(jax.jit(knn_step), x, index.points, index.centers,
                      index.radius, index.order, index.frame,
                      k_small=2, k_big=6)
    print(f"knn16 query: {dt*1e3:6.2f} ms (wall {time.time()-t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
