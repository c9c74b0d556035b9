"""On-chip performance regression gate (VERDICT r2 #6).

Correctness lanes cannot see a Mosaic/XLA fusion regression that halves
throughput; these tests pin FLOOR values well below the measured numbers
(BENCH.md) with the chained methodology (dicp_tpu.utils.timing.chained_rate
— the only truthful harness on the remote-attached runtime).

Floors vs measured (so tunnel jitter cannot flake the lane; tightened in
round 5 per VERDICT r4 #7 — ~70% of the trailing minimum, so a 1.5x
regression FAILS while tunnel jitter does not):

  headline B=256 IFT fwd+bwd   >= 130k reg/s   (measured 152k-230k r2-r5)
  cluster 1-NN query @100k     <= 12 ms        (measured 6.8-9.4 ms fused)
  cluster k=16 query @100k     <= 65 ms        (measured 43.2 ms fused r5;
                                                XLA k-pass path: 92 ms)
  pallas brute 1-NN @100k      <= 80 ms        (measured ~62 ms)
  scan-to-map step @60k/65k    <= 110 ms/scan  (measured 74.9-75.9 ms r5)
  scan-to-map sgd step         <= 45 ms/scan   (measured 29.4/29.4 ms r5;
                                                23.0 with merge_subsample)

Also the on-chip correctness gaps VERDICT flagged: symmetric ICP and the
streaming Gumbel soft-NN run compiled on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dicp_tpu.utils.timing import chained_rate


def test_headline_throughput_floor(pair_f32):
    """B=256 pt2pl IFT fwd+bwd must stay above 130k registrations/s."""
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift

    scan, mp = pair_f32
    B = 256
    src = jnp.asarray(np.stack([scan[:, :3]] * B))
    tgt = jnp.asarray(np.stack([mp] * B))
    ti = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    def step(s, tgt_, ti_):
        g = jax.grad(lambda s_: jnp.sum(register_ift(s_, tgt_, ti_,
                                                     None, cfg).T))(s)
        return jnp.sum(g) * 1e-6

    dt = chained_rate(step, src, tgt, ti, k_small=4, k_big=12, reps=3)
    reg_s = B / dt
    assert reg_s >= 130_000, f"headline regressed: {reg_s:.0f} reg/s"


def test_cluster_query_floor():
    """100k x 100k cluster 1-NN query (order amortized) <= 12 ms."""
    from dicp_tpu.ops.cluster_knn import (build_cluster_index, cluster_nn,
                                          query_order)

    rng = np.random.default_rng(3)
    y = rng.uniform(-20, 20, (100_000, 3)).astype(np.float32)
    y[:, 2] = np.sin(y[:, 0] * 0.3) * 2.0
    x = (y[rng.permutation(100_000)]
         + rng.normal(scale=0.05, size=(100_000, 3))).astype(np.float32)
    yj, xj = jnp.asarray(y), jnp.asarray(x)
    index = build_cluster_index(yj, 128)
    qord = query_order(index, xj)

    def step(xs, pts, cent, rad, order_, frame_, oq):
        from dicp_tpu.ops.cluster_knn import ClusterIndex

        ix = ClusterIndex(pts, cent, rad, order_, frame_)
        idx, d2, _ = cluster_nn(ix, xs, probes=32, order=oq)
        return jnp.sum(d2) + jnp.sum(idx.astype(jnp.float32)) * 1e-9

    dt = chained_rate(step, xj, index.points, index.centers, index.radius,
                      index.order, index.frame, qord,
                      k_small=2, k_big=6, reps=3)
    assert dt <= 0.012, f"cluster query regressed: {dt*1e3:.1f} ms"


def test_cluster_knn16_floor():
    """100k x 100k cluster k=16 exact kNN (fused VMEM extraction, the
    `knn_indices` scale path) <= 65 ms.  Measured 43.2 ms vs 92 ms for the
    XLA k-pass fallback (bench_suite large_cloud, r5)."""
    from dicp_tpu.ops.cluster_knn import (ClusterIndex, build_cluster_index,
                                          cluster_knn)

    rng = np.random.default_rng(5)
    y = rng.uniform(-20, 20, (100_000, 3)).astype(np.float32)
    y[:, 2] = np.sin(y[:, 0] * 0.3) * 2.0
    x = (y[rng.permutation(100_000)]
         + rng.normal(scale=0.05, size=(100_000, 3))).astype(np.float32)
    yj, xj = jnp.asarray(y), jnp.asarray(x)
    index = jax.jit(lambda t: build_cluster_index(t, 128))(yj)

    def step(xs, pts, cent, rad, order_, frame_):
        ix = ClusterIndex(pts, cent, rad, order_, frame_)
        idx, d2k, cert = cluster_knn(ix, xs, k=16, probes=32)
        return (jnp.sum(d2k) * 1e-9 + jnp.sum(cert)
                + jnp.sum(idx.astype(jnp.float32)) * 1e-9)

    dt = chained_rate(step, xj, index.points, index.centers, index.radius,
                      index.order, index.frame, k_small=2, k_big=5, reps=2)
    assert dt <= 0.065, f"cluster k=16 query regressed: {dt*1e3:.1f} ms"


def test_pallas_knn_floor():
    """100k x 100k brute-force Pallas 1-NN <= 80 ms (compute floor ~62)."""
    from dicp_tpu.ops.pallas_knn import nn_distances_pallas

    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.uniform(-20, 20, (100_000, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-20, 20, (100_000, 3)).astype(np.float32))

    def step(xs, ys):
        idx, d2 = nn_distances_pallas(xs, ys)
        return jnp.sum(d2) + jnp.sum(idx.astype(jnp.float32)) * 1e-9

    dt = chained_rate(step, x, y, k_small=2, k_big=5, reps=2)
    assert dt <= 0.080, f"pallas 1-NN regressed: {dt*1e3:.1f} ms"


def test_symmetric_icp_on_chip():
    """Symmetric pt2pl converges on chip (f32) — the lane gap VERDICT r2
    flagged; CPU tests cover it only in f64."""
    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    rng = np.random.default_rng(7)
    normals = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    pts, nrm = [], []
    for k in range(3):
        uv = rng.uniform(-5, 5, size=(200, 2))
        basis = np.eye(3)[[i for i in range(3) if i != np.argmax(normals[k])]]
        pts.append(uv @ basis + normals[k] * (2.0 + k))
        nrm.append(np.tile(normals[k], (200, 1)))
    cloud = np.hstack([np.vstack(pts), np.vstack(nrm)]).astype(np.float32)

    xi = jnp.asarray(np.array([.05, -.04, .06, .02, -.01, .03], np.float32))
    T_true = se3.vec2tran(xi)
    Ti = np.asarray(se3.tran_inv(T_true))
    src = np.hstack([cloud[:, :3] @ Ti[:3, :3].T + Ti[:3, 3],
                     cloud[:, 3:6] @ Ti[:3, :3].T]).astype(np.float32)

    cfg = ICPConfig(icp_type="symmetric", differentiable=True,
                    max_iterations=50, tolerance=1e-8, dim=3)
    res = register_jit(jnp.asarray(src[None]), jnp.asarray(cloud[None]),
                       jnp.eye(4, dtype=jnp.float32)[None], None, cfg=cfg)
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(T_true, se3.tran_inv(res.T[0])))))
    assert err < 1e-4, err


def test_streaming_gumbel_on_chip():
    """Streaming (online-softmax) Gumbel soft-NN compiled on chip: matches
    the dense path's convex-combination semantics at tiny tau (numerically
    one-hot -> equals hard NN)."""
    from dicp_tpu import knn

    rng = np.random.default_rng(9)
    # Coordinates scaled so nn-separation >> the Gumbel noise scale: the
    # tau->0 one-hot sits at argmax(-d2 + g) with g ~ Gumbel(0,1), so it
    # equals hard NN only when d2 gaps dominate g.  The original +-10 box
    # (nn d2 gap ~0.4 vs logistic-noise std ~1.8) gives ~23% agreement BY
    # THE MATH — identical 0.2305 measured on CPU f64 and on chip — so low
    # agreement there was a property of the distribution, not a TPU bug.
    y = jnp.asarray(rng.uniform(-300, 300, (5000, 6)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-300, 300, (512, 3)).astype(np.float32))
    key = jax.random.key(0)
    out = knn.gumbel_nn(x, y, key, tau=1e-3, chunk=512)   # streaming path
    hard = knn.hard_nn(x, y)
    agree = float(jnp.mean((jnp.linalg.norm(
        out[..., :3] - hard[..., :3], axis=-1) < 1e-2).astype(jnp.float32)))
    # numpy estimate at this separation: ~0.998 expected agreement; 0.97
    # leaves room for the backend-specific noise realization
    assert agree > 0.97, agree


def test_fused_cluster_kernel_exact_on_chip():
    """v2 fused block-search kernel COMPILED (not interpret): exact match
    with the XLA candidate path on chip, certificate sound vs brute force."""
    from dicp_tpu.ops.cluster_knn import (build_cluster_index, cluster_nn)
    from dicp_tpu.ops.pallas_knn import nn_indices_pallas

    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.uniform(-30, 30, (50_000, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-30, 30, (20_000, 3)).astype(np.float32))
    index = jax.jit(lambda t: build_cluster_index(t, 128))(y)
    idx_f, _, cert_f = cluster_nn(index, x, probes=32, fused=True)
    ref = np.asarray(nn_indices_pallas(x, y, interpret=False))
    cf = np.asarray(cert_f)
    mism = np.asarray(idx_f)[cf] != ref[cf]
    if mism.any():  # exact-tie twins allowed
        xr = np.asarray(x)[cf][mism]
        da = np.sum((xr - np.asarray(y)[np.asarray(idx_f)[cf][mism]])**2, -1)
        db = np.sum((xr - np.asarray(y)[ref[cf][mism]])**2, -1)
        np.testing.assert_allclose(da, db, rtol=1e-6)
    # fixup closes every gap
    idx_a, _, cert_a = cluster_nn(index, x, probes=32, fused=True,
                                  fixup=x.shape[0])
    assert bool(jnp.all(cert_a))


def test_fused_topk_exact_on_chip():
    """Fused VMEM top-k extraction COMPILED on chip: bitwise-identical
    neighbor sets, distances, and certificates vs the XLA k-pass path."""
    from dicp_tpu.ops.cluster_knn import build_cluster_index, cluster_knn

    rng = np.random.default_rng(13)
    y = jnp.asarray(rng.uniform(-20, 20, (30_000, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-20, 20, (10_000, 3)).astype(np.float32))
    index = jax.jit(lambda t: build_cluster_index(t, 128))(y)
    idx_f, d2_f, cert_f = cluster_knn(index, x, k=8, probes=32, fused=True)
    idx_x, d2_x, cert_x = cluster_knn(index, x, k=8, probes=32, fused=False)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d2_f), np.asarray(d2_x),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cert_f), np.asarray(cert_x))


def test_fused_gn_parity_on_chip(pair_f32):
    """Whole-solve fused GN kernel COMPILED (Mosaic, not interpret): every
    result field must match the XLA while driver on the reference pair —
    the gate for flipping the fused_small auto default."""
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    scan, mp = pair_f32
    B = 16
    src = jnp.asarray(np.stack([scan[:, :3]] * B))
    tgt = jnp.asarray(np.stack([mp] * B))
    ti = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    base = ICPConfig(icp_type="pt2pl", differentiable=False, driver="while",
                     collect_histories=False, max_iterations=60,
                     tolerance=1e-6, dim=2, trim_dist=5.0,
                     loss_name="huber", loss_metric=1.0, nn_method="dense")
    rf = register_jit(src, tgt, ti, None, cfg=base.with_(fused_small=True))
    rx = register_jit(src, tgt, ti, None, cfg=base.with_(fused_small=False))
    np.testing.assert_allclose(np.asarray(rf.T), np.asarray(rx.T),
                               atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(rf.converged),
                                  np.asarray(rx.converged))
    np.testing.assert_allclose(np.asarray(rf.iterations),
                               np.asarray(rx.iterations), atol=0)
    np.testing.assert_allclose(np.asarray(rf.matched_ratio),
                               np.asarray(rx.matched_ratio), atol=1e-5)


def test_scan_to_map_step_floor():
    """Chained scan-to-map step (60k-pt scan vs 65k-cap map, const_iter=10
    solve + fused-voxel merge) <= 110 ms/scan (measured 75.7 ms: 58.5 solve
    + 17.2 merge, benchmarks/bench_suite.py scan_to_map)."""
    from jax import lax

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.mapping import empty_map, map_merge, map_step

    S, n, cap, voxel = 8, 60_000, 65_536, 0.25
    rng = np.random.default_rng(21)
    base = rng.uniform(-20, 20, (n, 3))
    base[:, 2] = np.sin(base[:, 0] * 0.35) * np.cos(base[:, 1] * 0.3) * 2.0
    step_T = np.asarray(se3.vec2tran(jnp.asarray(np.array(
        [0.06, 0.03, 0.01, 0.004, 0.002, 0.015], np.float32)))).astype(np.float64)
    scans, T = [], np.eye(4)
    for _ in range(S):
        Ti = np.linalg.inv(T)
        scans.append((base @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32))
        T = T @ step_T
    scans_j = jnp.asarray(np.stack(scans))
    step_j = jnp.asarray(step_T.astype(np.float32))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False,
                    const_iter=True, max_iterations=10, tolerance=1e-6,
                    dim=3, trim_dist=2.0, loss_name="huber", loss_metric=0.5,
                    nn_method="cluster", collect_histories=False)

    @jax.jit
    def chain(scans, off):
        m0 = map_merge(empty_map(cap), scans[0] + off * 1e-7, voxel,
                       with_normals=True, mode="mean")

        def body(carry, scan):
            m, pose = carry
            p2, cv, it, m2 = map_step(m, scan, se3.compose(pose, step_j),
                                      None, cfg, voxel, insert=True,
                                      merge_mode="mean")
            return (m2, p2), it

        (m, pose), its = lax.scan(body, (m0, jnp.eye(4, dtype=jnp.float32)),
                                  scans[1:])
        return (jnp.sum(pose) + jnp.sum(m.pos) * 1e-9
                + jnp.sum(its.astype(jnp.float32)) * 1e-6)

    import time
    out = {}
    for K in (3, S):
        sl = scans_j[:K]
        float(chain(sl, jnp.float32(0.0)))   # compile
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            float(chain(sl, jnp.float32(rep + 1)))
            best = min(best, time.perf_counter() - t0)
        out[K] = best
    dt = (out[S] - out[3]) / (S - 3)
    assert dt <= 0.110, f"scan-to-map step regressed: {dt*1e3:.1f} ms/scan"


def test_scan_to_map_sgd_step_floor():
    """Stochastic scan-to-map step (solver='sgd', k=2048 mini-batch, the
    serving-throughput mode) <= 45 ms/scan (measured 29.4 ms twice in r5;
    23.0 ms with merge_subsample — this floor pins the plain sgd path)."""
    from jax import lax

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.mapping import empty_map, map_merge, map_step

    S, n, cap, voxel = 8, 60_000, 65_536, 0.25
    rng = np.random.default_rng(23)
    base = rng.uniform(-20, 20, (n, 3))
    base[:, 2] = np.sin(base[:, 0] * 0.35) * np.cos(base[:, 1] * 0.3) * 2.0
    step_T = np.asarray(se3.vec2tran(jnp.asarray(np.array(
        [0.06, 0.03, 0.01, 0.004, 0.002, 0.015], np.float32)))).astype(np.float64)
    scans, T = [], np.eye(4)
    for _ in range(S):
        Ti = np.linalg.inv(T)
        scans.append((base @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32))
        T = T @ step_T
    scans_j = jnp.asarray(np.stack(scans))
    step_j = jnp.asarray(step_T.astype(np.float32))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False,
                    max_iterations=30, tolerance=1e-6,
                    dim=3, trim_dist=2.0, loss_name="huber", loss_metric=0.5,
                    nn_method="cluster", collect_histories=False)

    @jax.jit
    def chain(scans, off):
        m0 = map_merge(empty_map(cap), scans[0] + off * 1e-7, voxel,
                       with_normals=True, mode="mean")
        key0 = jax.random.key(0)

        def body(carry, xs):
            m, pose = carry
            scan, i = xs
            p2, cv, it, m2 = map_step(m, scan, se3.compose(pose, step_j),
                                      None, cfg, voxel, insert=True,
                                      merge_mode="mean", solver="sgd",
                                      key=jax.random.fold_in(key0, i),
                                      sgd_minibatch=2048, sgd_iterations=30)
            return (m2, p2), it

        idx = jnp.arange(scans.shape[0] - 1, dtype=jnp.int32)
        (m, pose), its = lax.scan(body, (m0, jnp.eye(4, dtype=jnp.float32)),
                                  (scans[1:], idx))
        return (jnp.sum(pose) + jnp.sum(m.pos) * 1e-9
                + jnp.sum(its.astype(jnp.float32)) * 1e-6)

    import time
    out = {}
    for K in (3, S):
        sl = scans_j[:K]
        float(chain(sl, jnp.float32(0.0)))   # compile
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            float(chain(sl, jnp.float32(rep + 1)))
            best = min(best, time.perf_counter() - t0)
        out[K] = best
    dt = (out[S] - out[3]) / (S - 3)
    assert dt <= 0.045, f"sgd scan-to-map step regressed: {dt*1e3:.1f} ms/scan"
