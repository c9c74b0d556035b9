"""Attribute and optimize cluster_nn query time on chip.

cluster_knn_100k measured 54 ms build+query vs an expected ~10 ms.
Suspects: lax.top_k over (n, G) (full-sort lowering), the (Q, P, g, 3)
gather, and lax.map chunk sequencing.  Variants:

  t_build      index build alone
  t_lb         LB matrix + top_k alone (current selection)
  t_lb_approx  LB + jax.lax.approx_min_k + exact masked-min bound
  t_query_cN   full query at chunk size N
  t_total_*    build+query

Run: python benchmarks/exp_cluster.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.timing import chained_rate
from dicp_tpu.ops.cluster_knn import build_cluster_index, cluster_nn


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n = 100_000
    y = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))

    build = jax.jit(lambda t: build_cluster_index(t, 128))
    index = build(y)
    G = index.points.shape[0]
    P = 16

    def t(name, fn, *args, k_small=2, k_big=8):
        t0 = time.time()
        dt = chained_rate(fn, *args, k_small=k_small, k_big=k_big)
        print(f"{name}: {dt*1e3:7.2f} ms (wall {time.time()-t0:.0f}s)",
              flush=True)
        return dt

    # build alone (chained on y)
    def build_step(yy):
        ix = build_cluster_index(yy, 128)
        return jnp.sum(ix.centers) + jnp.sum(ix.order.astype(jnp.float32)) * 1e-9

    t("t_build", jax.jit(build_step), y)

    # LB + top_k selection alone
    def lb_topk_step(xx, c, r):
        d2c = jnp.sum((xx[:, None, :] - c[None]) ** 2, axis=-1)
        dc = jnp.sqrt(d2c)
        lb = jnp.maximum(dc - r[None], 0.0) ** 2
        neg, gsel = lax.top_k(-lb, P + 1)
        return jnp.sum(gsel.astype(jnp.float32)) * 1e-9 + jnp.sum(neg) * 1e-20

    t("t_lb_topk", jax.jit(lb_topk_step), x, index.centers, index.radius)

    # LB + approx_min_k + exact masked-min bound
    def lb_approx_step(xx, c, r):
        d2c = jnp.sum((xx[:, None, :] - c[None]) ** 2, axis=-1)
        dc = jnp.sqrt(d2c)
        lb = jnp.maximum(dc - r[None], 0.0) ** 2
        vals, gsel = lax.approx_min_k(lb, P, recall_target=0.95)
        # exact bound: min LB over NON-selected groups
        mask = jnp.zeros_like(lb).at[
            jnp.arange(lb.shape[0])[:, None], gsel].set(jnp.inf)
        bound = jnp.min(lb + mask, axis=-1)
        return (jnp.sum(gsel.astype(jnp.float32)) * 1e-9
                + jnp.sum(bound) * 1e-20)

    t("t_lb_approx", jax.jit(lb_approx_step), x, index.centers, index.radius)

    # full current query at several chunk sizes
    for chunk in (4096, 16384, 50000):
        def q_step(xx, pts, c, r, o, chunk=chunk):
            from dicp_tpu.ops.cluster_knn import ClusterIndex
            ix = ClusterIndex(pts, c, r, o)
            idx, d2, cert = cluster_nn(ix, xx, probes=P, chunk=chunk)
            return (jnp.sum(idx.astype(jnp.float32)) * 1e-9
                    + jnp.sum(d2) * 1e-20 + jnp.sum(cert) * 1e-9)

        t(f"t_query_c{chunk}", jax.jit(q_step, static_argnames=()), x,
          index.points, index.centers, index.radius, index.order)


if __name__ == "__main__":
    main()
