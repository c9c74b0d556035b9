"""On-chip smoke tests: compiled Pallas kernels, f32 accuracy, IFT grads,
sharded solvers — the contracts CI's CPU/interpret lane cannot see."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_knn_exact_on_chip():
    """Compiled (interpret=False) Pallas 1-NN vs dense argmin, both on chip.
    Same diff-form arithmetic -> exact index equality expected."""
    from dicp_tpu.ops.pallas_knn import nn_distances_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-50, 50, size=(4096, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-50, 50, size=(4096, 3)).astype(np.float32))
    idx, d2 = nn_distances_pallas(x, y, interpret=False)
    dense = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    ref_idx = jnp.argmin(dense, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    ref_d2 = jnp.min(dense, axis=1)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(ref_d2), rtol=1e-5)


def test_cluster_knn_certified_on_chip():
    """Cluster-pruned search on chip: certified and agreeing with the Pallas
    brute force (up to f32 exact ties)."""
    from dicp_tpu.ops.cluster_knn import build_cluster_index, cluster_nn
    from dicp_tpu.ops.pallas_knn import nn_indices_pallas

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(-30, 30, size=(50_000, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-30, 30, size=(20_000, 3)).astype(np.float32))
    index = jax.jit(lambda t: build_cluster_index(t, 128))(y)
    idx, d2, cert = cluster_nn(index, x, probes=32)
    ref = nn_indices_pallas(x, y, interpret=False)
    cert_np = np.asarray(cert)
    assert cert_np.mean() > 0.9, cert_np.mean()
    agree = float(jnp.mean((idx == ref).astype(jnp.float32)))
    assert agree > 0.995, agree
    # the actual contract: certified => identical to brute force (up to
    # exact-tie twins, which equal distances would show)
    both = np.asarray(idx)[cert_np] != np.asarray(ref)[cert_np]
    if both.any():
        xr = np.asarray(x)[cert_np][both]
        ya = np.asarray(y)[np.asarray(idx)[cert_np][both]]
        yb = np.asarray(y)[np.asarray(ref)[cert_np][both]]
        da = np.sum((xr - ya) ** 2, axis=-1)
        db = np.sum((xr - yb) ** 2, axis=-1)
        np.testing.assert_allclose(da, db, rtol=1e-6)


def test_register_f32_accuracy(pair_f32):
    """f32 register on the reference pair: transform error ~f32 resolution."""
    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    scan, mp = pair_f32
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0, driver="while")
    res = register_jit(jnp.asarray(scan[None, :, :3]), jnp.asarray(mp[None]),
                       jnp.eye(4, dtype=jnp.float32)[None], None, cfg=cfg)
    T_true = se3.tran_inv(se3.vec2tran(
        jnp.array([1., 1., 0, 0, 0, .1], jnp.float32)))
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(T_true, se3.tran_inv(res.T[0])))))
    assert err < 1e-5, err
    assert bool(res.converged[0])


def test_ift_matches_unrolled_on_chip(pair_f32):
    """IFT vs unrolled gradient cosine > 0.999 on the chip (f32)."""
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift
    from dicp_tpu.registration import register

    scan, mp = pair_f32
    B = 8
    src = jnp.asarray(np.stack([scan[:, :3]] * B))
    tgt = jnp.asarray(np.stack([mp] * B))
    ti = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    g_i = jax.jit(jax.grad(lambda s: jnp.sum(
        register_ift(s, tgt, ti, None, cfg).T)))(src)
    g_u = jax.jit(jax.grad(lambda s: jnp.sum(
        register(s, tgt, ti, None, cfg).T)))(src)
    g_i, g_u = np.asarray(g_i), np.asarray(g_u)
    assert np.all(np.isfinite(g_i)) and np.any(g_i != 0)
    cos = float(np.sum(g_i * g_u)
                / (np.linalg.norm(g_i) * np.linalg.norm(g_u)))
    assert cos > 0.999, cos


def test_map_sharded_on_chip(pair_f32):
    """Map-sharded solve executes on the real device mesh (psum path)."""
    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.parallel import make_mesh, register_map_sharded

    scan, mp = pair_f32
    mesh = make_mesh((1, len(jax.devices())))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=50,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)
    res = register_map_sharded(mesh, jnp.asarray(scan[:, :3]),
                               jnp.asarray(mp), cfg=cfg)
    T_true = se3.tran_inv(se3.vec2tran(
        jnp.array([1., 1., 0, 0, 0, .1], jnp.float32)))
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(T_true, se3.tran_inv(res.T)))))
    assert err < 1e-5, err


def test_normals_on_chip():
    """estimate_normals (cluster path) on a 50k surface, accuracy vs truth."""
    from dicp_tpu.ops.normals import estimate_normals

    rng = np.random.default_rng(2)
    n = 50_000
    uv = rng.uniform(-20, 20, size=(n, 2)).astype(np.float32)
    pts = np.column_stack([uv[:, 0], uv[:, 1],
                           0.1 * np.sin(uv[:, 0])]).astype(np.float32)
    est = jax.jit(lambda p: estimate_normals(p, k=16, method="cluster"))
    nrm = np.asarray(est(jnp.asarray(pts)))
    true_n = np.column_stack([-0.1 * np.cos(uv[:, 0]), np.zeros(n), np.ones(n)])
    true_n /= np.linalg.norm(true_n, axis=1, keepdims=True)
    dots = np.abs(np.sum(nrm * true_n, axis=-1))
    assert float(np.median(dots)) > 0.999, float(np.median(dots))


def test_gicp_on_chip():
    """GICP (f32, compiled) on a curved scene: pose error ~f32 floor, and
    the IFT backward's 6x6 adjoint pipeline runs on the chip (finite,
    nonzero, direction-consistent with unrolled)."""
    from dicp_tpu import se3
    from dicp_tpu.gicp import register_gicp, register_gicp_ift

    rng = np.random.default_rng(11)
    xy = rng.uniform(-3, 3, size=(400, 2))
    scene = np.column_stack(
        [xy, 0.09 * (xy[:, 0] ** 2 - xy[:, 1] ** 2)]).astype(np.float32)
    xi = np.array([0.2, -0.15, 0.1, 0.06, -0.04, 0.08], np.float64)
    T_np = np.asarray(se3.vec2tran(
        jnp.asarray(xi.astype(np.float32)))).astype(np.float64)
    # host-f64 source generation (bf16 matmul trap, BENCH.md)
    src = (scene[:, :3].astype(np.float64) @ T_np[:3, :3].T
           + T_np[:3, 3]).astype(np.float32)
    S = jnp.asarray(src[None])
    Tg = jnp.asarray(scene[None])
    Ti = jnp.eye(4, dtype=jnp.float32)[None]

    res = jax.jit(lambda s, t, ti: register_gicp(
        s, t, ti, max_iterations=40, tolerance=1e-6))(S, Tg, Ti)
    T_true = se3.tran_inv(jnp.asarray(T_np.astype(np.float32)))
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(T_true, se3.tran_inv(res.T[0])))))
    assert err < 1e-4, err
    assert bool(res.converged[0])

    g_i = np.asarray(jax.jit(jax.grad(lambda s: jnp.sum(register_gicp_ift(
        s, Tg, Ti, max_iterations=40, tolerance=1e-6).T)))(S))
    g_u = np.asarray(jax.jit(jax.grad(lambda s: jnp.sum(register_gicp(
        s, Tg, Ti, max_iterations=15, tolerance=1e-6,
        differentiable=True).T)))(S))
    assert np.all(np.isfinite(g_i)) and np.abs(g_i).max() > 0
    cos = float(np.sum(g_i * g_u)
                / (np.linalg.norm(g_i) * np.linalg.norm(g_u)))
    assert cos > 0.999, cos


def test_multiscale_on_chip():
    """Voxel-pyramid registration (f32, compiled, cluster final level) on a
    20k cloud: same pose as single-scale, fewer full-res iterations."""
    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.multiscale import ScaleLevel, register_multiscale
    from dicp_tpu.registration import register

    from benchmarks.bench_suite import _make_scene

    n = 20_000
    target = jnp.asarray(_make_scene(n))
    xi = np.array([0.4, -0.25, 0.1, 0.03, -0.05, 0.08], np.float64)
    T_np = np.asarray(se3.vec2tran(
        jnp.asarray(xi.astype(np.float32)))).astype(np.float64)
    source = jnp.asarray(
        (np.asarray(target[:, :3], np.float64) @ T_np[:3, :3].T
         + T_np[:3, 3]).astype(np.float32))
    T_true = se3.tran_inv(jnp.asarray(T_np.astype(np.float32)))

    cfg = ICPConfig(icp_type="pt2pl", differentiable=False,
                    max_iterations=30, tolerance=1e-5, dim=3, trim_dist=2.0,
                    loss_name="huber", loss_metric=1.0, nn_method="cluster",
                    collect_histories=False)
    levels = (ScaleLevel(1.0, 2048, 2048, 15, 1e-3, trim_dist=8.0,
                         nn_method="dense"),
              ScaleLevel(0.0, 0, 0, 30, 1e-5))
    ms = jax.jit(lambda s, t, ti: register_multiscale(
        s[None], t[None], ti[None], None, cfg, levels))(
        source, target, jnp.eye(4, dtype=jnp.float32))
    res = jax.jit(lambda s, t, ti: register(
        s[None], t[None], ti[None], None, cfg))(
        source, target, jnp.eye(4, dtype=jnp.float32))

    def err_of(T):
        return float(jnp.linalg.norm(se3.tran2vec(
            se3.compose(T_true, se3.tran_inv(T)))))

    assert err_of(ms.result.T[0]) < 5e-4, err_of(ms.result.T[0])
    assert err_of(res.T[0]) < 5e-4
    assert (float(ms.level_iterations[-1, 0]) <= float(res.iterations[0]))


def test_sgd_icp_on_chip():
    """Stochastic mini-batch GN (f32, compiled, cluster backend at 20k):
    pose recovery near the f32 floor with O(k*m) -> O(k*probes*group)
    per-iteration correspondence cost."""
    from dicp_tpu import se3
    from dicp_tpu.sgd_icp import register_sgd

    from benchmarks.bench_suite import _make_scene

    n = 20_000
    target = jnp.asarray(_make_scene(n))
    xi = np.array([0.1, -0.08, 0.05, 0.04, -0.03, 0.05], np.float64)
    T_np = np.asarray(se3.vec2tran(
        jnp.asarray(xi.astype(np.float32)))).astype(np.float64)
    # host-f64 source generation (bf16 matmul trap, BENCH.md)
    source = jnp.asarray(
        (np.asarray(target[:, :3], np.float64) @ T_np[:3, :3].T
         + T_np[:3, 3]).astype(np.float32))
    T_true = se3.tran_inv(jnp.asarray(T_np.astype(np.float32)))

    res = jax.jit(lambda s, t, ti, k: register_sgd(
        s[None], t[None], ti[None], k, minibatch=1024, iterations=40,
        tolerance=1e-5))(source, target, jnp.eye(4, dtype=jnp.float32),
                         jax.random.key(0))
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(T_true, se3.tran_inv(res.T[0])))))
    assert err < 5e-4, err
    assert bool(res.converged[0])


def test_slam_loop_on_chip():
    """Closed-loop SLAM (front-end + keyframe closures + robust pose-graph
    back-end) end-to-end compiled on the real chip in f32: closures must
    fire on a revisit and refinement must reduce the loop-closure error.
    Small shapes — the contract here is that the composition compiles and
    behaves, not throughput (that is benchmarks/bench_suite.py scan_to_map
    and tests/test_slam.py's 5x ATE contract on the CPU lane)."""
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.slam import slam_odometry

    rng = np.random.default_rng(5)
    R, per_lap, laps, n = 5.0, 16, 2, 1024
    w = np.empty((20000, 3))
    w[:, 0] = rng.uniform(-R - 8, R + 8, 20000)
    w[:, 1] = rng.uniform(-R - 8, R + 8, 20000)
    w[:, 2] = np.sin(w[:, 0] * 0.6) * np.cos(w[:, 1] * 0.5) * 1.5
    scans, poses_true = [], []
    for k in range(laps * per_lap + 1):
        th = 2 * np.pi * k / per_lap
        t = np.array([R * np.cos(th), R * np.sin(th), 0.0])
        c, s = np.cos(th + np.pi / 2), np.sin(th + np.pi / 2)
        Rm = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        T = np.eye(4); T[:3, :3] = Rm; T[:3, 3] = t
        d = np.linalg.norm(w[:, :2] - t[None, :2], axis=1)
        idx = np.flatnonzero(d < 6.0)
        sel = rng.choice(idx, n, replace=len(idx) < n)
        local = ((w[sel] - t) @ Rm
                 + rng.normal(scale=0.03, size=(n, 3)))
        scans.append(local.astype(np.float32))
        poses_true.append(T)
    P = np.stack(poses_true)
    poses_true = np.einsum("ij,kjl->kil", np.linalg.inv(P[0]), P)

    cfg = ICPConfig(icp_type="pt2pl", differentiable=False,
                    max_iterations=40, tolerance=1e-4, dim=3, trim_dist=2.0,
                    loss_name="huber", loss_metric=0.5,
                    collect_histories=False)
    res = slam_odometry(((s, None) for s in scans), cfg,
                        capacity=1024, voxel=0.25, anchor_every=4,
                        closure_gap=12, detect_every=2, detect_radius=5.0,
                        accept_ratio=0.5, max_closures=20,
                        closure_info=30.0, refine_iterations=10)
    assert len(res.closures) >= 1
    ef = np.linalg.norm(np.asarray(res.poses_front[-1][:3, 3])
                        - poses_true[-1][:3, 3])
    er = np.linalg.norm(np.asarray(res.poses[-1][:3, 3])
                        - poses_true[-1][:3, 3])
    assert np.isfinite(er)
    assert er <= ef + 1e-3, (er, ef)
