"""Round-5 A/B (VERDICT r4 #6): the v2 fused cluster kernel INSIDE the
map-sharded shard_map body.

Round 3 made the fused kernel the default for plain cluster_nn on TPU
(6.8 ms vs 8.5 ms XLA at 100k x 100k) but pinned it OFF inside
shard_map/vmap until validated there; round 4 cleared vmap.  This runs the
flagship sharded 100k solve through a REAL shard_map on the attached chip
(1-device mesh — same Mosaic-inside-shard_map lowering path as N devices;
the multi-device parity lane is tests/test_parallel.py on the 8-virtual CPU
mesh) with cfg.sharded_fused False vs True:

  * parity: identical pose, convergence, iteration count
  * timing: chained per-solve rate for both settings

Run: timeout 590 python benchmarks/exp_shardmap_fused.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from benchmarks.bench_suite import _make_scene
from benchmarks.timing import chained_rate
from dicp_tpu import se3
from dicp_tpu.config import ICPConfig
from dicp_tpu.parallel.sharding import map_sharded_fn


def main():
    n = 100_000
    target = jnp.asarray(_make_scene(n))
    xi = np.array([0.2, -0.1, 0.05, 0.01, -0.02, 0.03], np.float32)
    T_st = np.asarray(se3.vec2tran(jnp.asarray(xi))).astype(np.float64)
    source = jnp.asarray((np.asarray(target[:, :3], np.float64) @ T_st[:3, :3].T
                          + T_st[:3, 3]).astype(np.float32))
    weight = jnp.ones((n,), jnp.float32)
    t_init = jnp.eye(4, dtype=jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:1]), ("map",))
    base = ICPConfig(icp_type="pt2pl", differentiable=False,
                     max_iterations=30, tolerance=1e-5, dim=3, trim_dist=2.0,
                     loss_name="huber", loss_metric=1.0, nn_method="cluster")

    results = {}
    for fused in (False, True):
        cfg = base.with_(sharded_fused=fused)
        fn = map_sharded_fn(mesh, cfg)

        T, done, it, cost = fn(source, weight, target, t_init)
        results[fused] = (np.asarray(T), bool(done), float(it))

        def step(s, w, tgt, ti, _fn=fn):
            T, done, it, cost = _fn(s, w, tgt, ti)
            return (jnp.sum(T) + done.astype(jnp.float32) * 1e-9
                    + it.astype(jnp.float32) * 1e-9 + cost * 1e-20)

        dt = chained_rate(step, source, weight, target, t_init,
                          k_small=1, k_big=4, reps=3)
        print(f"sharded_fused={fused}: {dt*1e3:.2f} ms/solve, "
              f"iters={float(it)}, converged={bool(done)}", flush=True)

    T0, d0, i0 = results[False]
    T1, d1, i1 = results[True]
    print("pose max|diff|:", float(np.abs(T0 - T1).max()), flush=True)
    print("iters:", i0, i1, "conv:", d0, d1, flush=True)
    np.testing.assert_allclose(T0, T1, atol=1e-6)
    assert i0 == i1 and d0 == d1
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
