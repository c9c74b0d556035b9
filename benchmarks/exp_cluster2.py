"""Round 2 of cluster query attribution: isolate LB form, top_k, gather.

Run: python benchmarks/exp_cluster2.py
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

P = 16


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n = 100_000
    y = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))
    index = jax.jit(lambda t: build_cluster_index(t, 128))(y)
    G, g, _ = index.points.shape
    print(f"G={G} g={g}", flush=True)

    def t(name, fn, *args, k_small=2, k_big=8):
        t0 = time.time()
        dt = chained_rate(jax.jit(fn), *args, k_small=k_small, k_big=k_big)
        print(f"{name}: {dt*1e3:7.2f} ms (wall {time.time()-t0:.0f}s)", flush=True)
        return dt

    c, r = index.centers, index.radius

    # LB matrix: broadcast diff form
    def lb_bcast(xx, c, r):
        d2c = jnp.sum((xx[:, None, :] - c[None]) ** 2, axis=-1)
        lb = jnp.maximum(jnp.sqrt(d2c) - r[None], 0.0) ** 2
        return jnp.sum(lb) * 1e-20

    t("lb_bcast", lb_bcast, x, c, r)

    # LB matrix: MXU score form
    def lb_mxu(xx, c, r):
        nx = jnp.sum(xx * xx, axis=-1)
        nc = jnp.sum(c * c, axis=-1)
        xc = jnp.matmul(xx, c.T, precision=lax.Precision.HIGHEST)
        d2c = jnp.maximum(nx[:, None] + nc[None] - 2 * xc, 0.0)
        lb = jnp.maximum(jnp.sqrt(d2c) - r[None], 0.0) ** 2
        return jnp.sum(lb) * 1e-20

    t("lb_mxu", lb_mxu, x, c, r)

    # LB mxu + top_k
    def lb_mxu_topk(xx, c, r):
        nx = jnp.sum(xx * xx, axis=-1)
        nc = jnp.sum(c * c, axis=-1)
        xc = jnp.matmul(xx, c.T, precision=lax.Precision.HIGHEST)
        d2c = jnp.maximum(nx[:, None] + nc[None] - 2 * xc, 0.0)
        lb = jnp.maximum(jnp.sqrt(d2c) - r[None], 0.0) ** 2
        neg, gsel = lax.top_k(-lb, P + 1)
        return jnp.sum(gsel.astype(jnp.float32)) * 1e-9 + jnp.sum(neg) * 1e-20

    t("lb_mxu_topk", lb_mxu_topk, x, c, r)

    # LB mxu + iterative P-min extraction (no top_k)
    def lb_mxu_itermin(xx, c, r):
        nx = jnp.sum(xx * xx, axis=-1)
        nc = jnp.sum(c * c, axis=-1)
        xc = jnp.matmul(xx, c.T, precision=lax.Precision.HIGHEST)
        d2c = jnp.maximum(nx[:, None] + nc[None] - 2 * xc, 0.0)
        lb = jnp.maximum(jnp.sqrt(d2c) - r[None], 0.0) ** 2

        def body(lb_c, _):
            j = jnp.argmin(lb_c, axis=-1)
            lb_c = lb_c.at[jnp.arange(lb_c.shape[0]), j].set(jnp.inf)
            return lb_c, j

        lb2, js = lax.scan(body, lb, None, length=P + 1)
        return jnp.sum(js.astype(jnp.float32)) * 1e-9 + jnp.sum(lb2) * 1e-30

    t("lb_mxu_itermin", lb_mxu_itermin, x, c, r)

    # scattered gather + search with PRECOMPUTED gsel (isolates gather+search)
    rngsel = jnp.asarray(
        rng.integers(0, G, size=(n, P)).astype(np.int32))

    def gather_search(xx, pts, gs, order):
        def one(args):
            xq, gsq = args
            cand = pts[gsq]                               # (Q, P, g, 3)
            d2 = jnp.sum((xq[:, None, None, :] - cand) ** 2, axis=-1)
            d2 = d2.reshape(xq.shape[0], -1)
            j = jnp.argmin(d2, axis=-1)
            best = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
            pos = jnp.take_along_axis(gsq, (j // g)[:, None], axis=-1)[:, 0] * g + j % g
            return order[pos], best

        nb = n // 4096
        idx, best = lax.map(one, (xx.reshape(nb, 4096, 3),
                                  gs.reshape(nb, 4096, P)))
        return jnp.sum(idx.astype(jnp.float32)) * 1e-9 + jnp.sum(best) * 1e-20

    t("gather_search_rand", gather_search, x, index.points, rngsel, index.order)

    # banded full query (the new default)
    def banded(xx, pts, cc, rr, oo, ks, fr):
        from dicp_tpu.ops.cluster_knn import ClusterIndex
        ix = ClusterIndex(pts, cc, rr, oo, ks, fr)
        idx, d2, cert = cluster_nn(ix, xx, probes=P)
        return (jnp.sum(idx.astype(jnp.float32)) * 1e-9
                + jnp.sum(d2) * 1e-20 + jnp.sum(cert) * 1e-9)

    t("banded_full_W16", banded, x, index.points, index.centers, index.radius,
      index.order, index.key_starts, index.frame)

    # accuracy of banded on chip data
    from dicp_tpu.ops.pallas_knn import nn_indices_pallas
    idx, d2, cert = cluster_nn(index, x, probes=P)
    ref = nn_indices_pallas(x, y, interpret=False)
    agree = float(jnp.mean((idx == ref).astype(jnp.float32)))
    print(f"banded W16 agreement vs bruteforce: {agree:.6f}  cert "
          f"{float(jnp.mean(cert.astype(jnp.float32))):.4f}", flush=True)
    idx, d2, cert = cluster_nn(index, x, probes=32)
    agree = float(jnp.mean((idx == ref).astype(jnp.float32)))
    print(f"banded W32 agreement vs bruteforce: {agree:.6f}  cert "
          f"{float(jnp.mean(cert.astype(jnp.float32))):.4f}", flush=True)


if __name__ == "__main__":
    main()
