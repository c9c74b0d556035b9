"""Round-3 experiment: v2 fused cluster-search kernel vs the XLA path.

Measures the 100k x 100k query stage (index + query order prebuilt, as the
solver amortizes them) with the chained methodology, plus certified%% /
agreement-vs-brute-force for each configuration.  Sweep: superblock size Qs
and probe count P.  VERDICT r2 #1 target: query <= ~7 ms so cluster_knn_100k
(build + query) <= 8 ms.

Run:  timeout 550 python benchmarks/exp_cluster4.py [configs...]
Configs as CLI args, e.g.  xla f512p32 f512p48 f256p32
(default: xla f512p48)  — keep per-invocation compile count small; the
remote compiler has multi-minute congestion windows.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.timing import chained_rate  # noqa: E402

from dicp_tpu.ops.cluster_knn import (build_cluster_index, cluster_nn,  # noqa: E402
                                      query_order)


def main():
    configs = sys.argv[1:] or ["xla", "f512p48"]
    rng = np.random.default_rng(42)
    m = n = 100_000
    # realistic scan-like geometry: points on smooth surfaces, +-20 m extent
    y_np = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
    y_np[:, 2] = np.sin(y_np[:, 0] * 0.3) * np.cos(y_np[:, 1] * 0.3) * 2.0
    y_np += rng.normal(scale=0.02, size=(m, 3)).astype(np.float32)
    x_np = y_np[rng.permutation(m)[:n]] + rng.normal(
        scale=0.05, size=(n, 3)).astype(np.float32)

    y = jnp.asarray(y_np)
    x = jnp.asarray(x_np)
    index = build_cluster_index(y, 128)
    qord = query_order(index, x)
    jax.block_until_ready(index.points)

    # ground truth for agreement: exact brute-force kernel (62 ms once)
    from dicp_tpu.ops.pallas_knn import nn_indices_pallas

    bf = np.asarray(nn_indices_pallas(x, y))

    for name in configs:
        if name == "xla":
            kw = dict(fused=False)
        else:
            qs, p = name[1:].split("p")
            kw = dict(fused=True, fused_qblock=int(qs), probes=int(p))

        def step(xs, pts, cent, rad, order_, frame_, ord_q, probes=kw.get(
                "probes", 32), fused=kw["fused"],
                fq=kw.get("fused_qblock", 512)):
            from dicp_tpu.ops.cluster_knn import ClusterIndex

            ix = ClusterIndex(pts, cent, rad, order_, frame_)
            idx, d2, cert = cluster_nn(ix, xs, probes=probes, order=ord_q,
                                       fused=fused, fused_qblock=fq)
            return (jnp.sum(d2.astype(jnp.float32))
                    + jnp.sum(idx.astype(jnp.float32)) * 1e-9)

        # accuracy once (outside timing)
        idx_c, _, cert_c = cluster_nn(
            index, x, probes=kw.get("probes", 32), order=qord,
            fused=kw["fused"], fused_qblock=kw.get("fused_qblock", 512))
        agree = float((np.asarray(idx_c) == bf).mean())
        certp = float(np.asarray(cert_c).mean())

        t0 = time.time()
        dt = chained_rate(step, x, index.points, index.centers, index.radius,
                          index.order, index.frame, qord,
                          k_small=4, k_big=12, reps=3)
        print(f"{name}: {dt*1e3:.2f} ms/query  agree={agree:.4%} "
              f"certified={certp:.4%}  (wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
