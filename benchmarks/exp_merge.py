"""On-chip phase attribution for the fused-voxel map merge (mapping.map_merge).

The chained scan-to-map rows put the merge at ~16 ms/scan (BENCH.md) — over
half the stochastic-front-end step.  Before optimizing the 125k-row lexsort
it's worth knowing how much of the 16 ms *is* the lexsort: map_merge also
runs `estimate_normals_weighted` over the incoming 60k-pt scan
(normals_100k measured 9.6 ms at 100k queries, so ~6 ms at 60k is
plausible), two segment reductions, and the LRU recency argsort.

Variants (all via the chained harness, 65k-cap map as a fixed jit arg):
  merge_full        — map_merge(with_normals=True), the production path
  merge_nonormals   — with_normals=False: (full - nonormals) isolates the
                      scan normal estimation
  lexsort125k_only  — just the 125k-row 3-key lexsort + gather
  packedsort125k_only — same sort with the 3 cell keys packed into ONE
                      int32 rank key (single-key comparator)
  recency_sort_only — the LRU argsort over segment recency

Run: timeout 1700 python -u benchmarks/exp_merge.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chained_rate


def _emit(name, value, unit, **detail):
    print(json.dumps({"name": name, "value": round(float(value), 3),
                      "unit": unit, **detail}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import _make_scene
    from dicp_tpu.mapping import LocalMap, empty_map, map_merge

    print(f"backend={jax.default_backend()} dev={jax.devices()[0]}",
          file=sys.stderr, flush=True)

    n, cap, voxel = 60_000, 65_536, 0.25
    scan = jnp.asarray(_make_scene(n)[:, :3])
    m0 = map_merge(empty_map(cap), scan, voxel, with_normals=True,
                   mode="mean")

    for tag, wn in (("merge_full", True), ("merge_nonormals", False)):
        def step(s, pos, m2, count, last, stp, _wn=wn):
            m = LocalMap(pos, m2, count, last, stp)
            mo = map_merge(m, s, voxel, with_normals=_wn, mode="mean")
            return (jnp.sum(mo.pos) * 1e-9 + jnp.sum(mo.count) * 1e-9
                    + jnp.sum(mo.m2) * 1e-12)

        dt = chained_rate(step, scan, m0.pos, m0.m2, m0.count, m0.last,
                          m0.step, k_small=2, k_big=8)
        _emit(tag, dt * 1e3, "ms")

    # --- raw 125k-row 3-key lexsort + gather (the merge's sort pattern)
    R = cap + n
    big = jnp.asarray(np.random.default_rng(0).uniform(
        -20, 20, (R, 3)).astype(np.float32))

    def lexsort_step(pos):
        cell = jnp.floor(pos / voxel).astype(jnp.int32)
        order = jnp.lexsort((cell[:, 2], cell[:, 1], cell[:, 0]))
        return jnp.sum(pos[order]) * 1e-9

    dt = chained_rate(lexsort_step, big, k_small=2, k_big=8)
    _emit("lexsort125k_only", dt * 1e3, "ms")

    # --- single-int32-key variant of the same sort (rank-packed: safe for
    # any occupied extent because ranks, not absolute cells, are packed)
    def packed_step(pos):
        cell = jnp.floor(pos / voxel).astype(jnp.int32)
        cmin = jnp.min(cell, axis=0)
        ext = jnp.max(cell, axis=0) - cmin + 1
        key = ((cell[:, 0] - cmin[0]) * ext[1]
               + (cell[:, 1] - cmin[1])) * ext[2] + (cell[:, 2] - cmin[2])
        order = jnp.argsort(key)
        return jnp.sum(pos[order]) * 1e-9

    dt = chained_rate(packed_step, big, k_small=2, k_big=8)
    _emit("packedsort125k_only", dt * 1e3, "ms")

    # --- recency argsort (the LRU eviction sort)
    lastv = jnp.asarray(np.random.default_rng(1).integers(
        0, 1000, (R,)).astype(np.int32))

    def rec_step(last):
        keep = jnp.argsort(-last.astype(jnp.int32), stable=True)[:cap]
        return jnp.sum(keep.astype(jnp.float32)) * 1e-9

    dt = chained_rate(lambda l: rec_step(l), lastv.astype(jnp.float32),
                      k_small=2, k_big=8)
    _emit("recency_sort_only", dt * 1e3, "ms")


if __name__ == "__main__":
    main()
