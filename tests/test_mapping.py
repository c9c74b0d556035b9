"""Scan-to-map odometry (dicp_tpu.mapping): the persistent-local-map upgrade
over scan-to-scan chaining.  No reference counterpart (the reference solves
single pairs, SURVEY.md §1); the accuracy contract here is the module's own:
anchoring scans to an accumulated world-frame map must keep the pose error
BOUNDED while scan-to-scan chaining drifts past it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.config import ICPConfig
from dicp_tpu.mapping import (LocalMap, empty_map, map_merge, map_target,
                              scan_to_map_odometry)
from dicp_tpu.odometry import ate, odometry

CFG = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=40,
                tolerance=1e-10, dim=3, trim_dist=2.0,
                loss_name="huber", loss_metric=0.5,
                collect_histories=False)
CFG_S2S = CFG.with_(icp_type="pt2pt")   # scans carry no normals


def _scene(n=2000, seed=0):
    """Wavy 3-D surface — dense enough that voxel centroids sit on it."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-8, 8, (n, 3))
    pts[:, 2] = np.sin(pts[:, 0] * 0.6) * np.cos(pts[:, 1] * 0.5) * 1.5
    return pts


def _sequence(n_scans, noise=0.0, seed=1, n=2000,
              step_xi=(0.06, 0.03, 0.01, 0.004, 0.002, 0.015)):
    """scan_i = scene in frame_i (pose_i = step^i), + optional sensor noise."""
    rng = np.random.default_rng(seed)
    scene = _scene(n)
    step = np.asarray(se3.vec2tran(jnp.asarray(np.array(step_xi))))
    scans, poses = [], []
    T = np.eye(4)
    for _ in range(n_scans):
        Ti = np.linalg.inv(T)
        s = scene @ Ti[:3, :3].T + Ti[:3, 3]
        if noise:
            s = s + rng.normal(scale=noise, size=s.shape)
        scans.append(s)
        poses.append(T.copy())
        T = T @ step
    return scans, jnp.asarray(np.stack(poses))


def _final_err(res_poses, poses_true):
    return float(np.linalg.norm(np.asarray(se3.tran2vec(jnp.asarray(
        np.linalg.inv(np.asarray(poses_true[-1])) @ np.asarray(res_poses[-1]))))))


def test_scan_to_map_recovers_clean_trajectory():
    scans, poses_true = _sequence(6)
    res = scan_to_map_odometry(((s, None) for s in scans), CFG,
                               capacity=8192, voxel=0.25)
    assert bool(jnp.all(res.converged))
    err = float(ate(res.poses, poses_true, align=False))
    # fused plane map: tangential voxel-quantization bias projected out;
    # what remains is ~curvature-within-voxel, far below the voxel size
    assert err < 1e-3, err
    # rel_transforms must be consistent with poses
    re = np.asarray(res.poses[:-1]) @ np.asarray(res.rel_transforms)
    np.testing.assert_allclose(re, np.asarray(res.poses[1:]), atol=1e-10)


def test_scan_to_map_bounds_drift_under_noise():
    """The whole point of the map: with sensor noise, scan-to-scan chaining
    random-walks while the map keeps every scan anchored to one world
    frame — by the end of a long sequence the s2s drift exceeds the
    (bounded) scan-to-map error."""
    scans, poses_true = _sequence(72, noise=0.045, seed=3, n=1000)
    s2s = odometry(jnp.asarray(np.stack(scans)), CFG_S2S)
    s2m = scan_to_map_odometry(((s, None) for s in scans), CFG,
                               capacity=8192, voxel=0.25)
    e_s2s = _final_err(s2s.poses, poses_true)
    e_s2m = _final_err(s2m.poses, poses_true)
    assert e_s2m < e_s2s, (e_s2m, e_s2s)


def test_sgd_front_end_tracks_trajectory():
    """solver='sgd' (stochastic mini-batch front-end, the serving
    throughput mode): tracks the clean trajectory to well under the voxel
    size, deterministic under a fixed seed.  The returned `converged`
    flags are the pose-consistency merge gate (see map_step) — the
    solver's own EMA streak was measured never to fire even at 1e-4 on
    this scene (mini-batch step noise ~sigma/sqrt(k) dominates), so it
    cannot gate merges."""
    scans, poses_true = _sequence(6)
    cfg = CFG.with_(tolerance=1e-5)
    kw = dict(capacity=8192, voxel=0.25, solver="sgd",
              sgd_minibatch=512, sgd_iterations=40, seed=7)
    res = scan_to_map_odometry(((s, None) for s in scans), cfg, **kw)
    assert bool(jnp.all(res.converged)), np.asarray(res.converged)
    err = float(ate(res.poses, poses_true, align=False))
    assert err < 5e-3, err   # mini-batch noise ball; GN bound is 1e-3
    res2 = scan_to_map_odometry(((s, None) for s in scans), cfg, **kw)
    np.testing.assert_array_equal(np.asarray(res.poses),
                                  np.asarray(res2.poses))
    # missing key is an error, not a silent nondeterminism source
    from dicp_tpu.mapping import empty_map as _em, map_step

    with pytest.raises(ValueError, match="PRNG key"):
        map_step(_em(64), jnp.asarray(scans[0].astype(np.float32)),
                 jnp.eye(4, dtype=jnp.float32), None, cfg, 0.25,
                 solver="sgd")


def test_merge_subsample_tracks_trajectory():
    """merge_subsample: solving with every point but merging a strided
    third of each scan must still track the clean trajectory (the running
    means integrate observations across scans; exp_merge.py attributes
    ~45% of the merge cost to scan normal estimation, which this cuts
    proportionally)."""
    scans, poses_true = _sequence(6)
    res = scan_to_map_odometry(((s, None) for s in scans), CFG,
                               capacity=8192, voxel=0.25,
                               merge_subsample=700)
    assert bool(jnp.all(res.converged))
    err = float(ate(res.poses, poses_true, align=False))
    assert err < 3e-3, err


def test_quantized_scan_transfer():
    """quantize=True: scans cross host->device as packed (n, 4) uint16 and
    are dequantized inside the solve program; the trajectory must match
    the f32 stream to the quantization's fixed-point shift (~1e-4 scale,
    the pipeline's measured mechanism), and weighted scans must be
    rejected (weight transfer defeats the byte budget)."""
    scans, poses_true = _sequence(6)
    scans32 = [s.astype(np.float32) for s in scans]
    cfg = CFG.with_(tolerance=1e-6)
    res_f = scan_to_map_odometry(((s, None) for s in scans32), cfg,
                                 capacity=8192, voxel=0.25)
    res_q = scan_to_map_odometry(((s, None) for s in scans32), cfg,
                                 capacity=8192, voxel=0.25, quantize=True)
    assert bool(jnp.all(res_q.converged))
    err = float(ate(res_q.poses, poses_true.astype(res_q.poses.dtype),
                    align=False))
    err_f = float(ate(res_f.poses, poses_true.astype(res_f.poses.dtype),
                      align=False))
    assert err < max(5 * err_f, 2e-3), (err, err_f)
    with pytest.raises(ValueError, match="weightless"):
        scan_to_map_odometry(
            ((s, np.ones(s.shape[0], np.float32)) for s in scans32), cfg,
            capacity=8192, voxel=0.25, quantize=True)


def test_merge_modes_agree_on_clean_data():
    """freeze vs mean merge: identical first insert; both track a clean
    trajectory (values only diverge by noise averaging, absent here)."""
    scans, poses_true = _sequence(5)
    for mode in ("mean", "freeze"):
        res = scan_to_map_odometry(((s, None) for s in scans), CFG,
                                   capacity=8192, voxel=0.25,
                                   merge_mode=mode)
        err = float(ate(res.poses, poses_true, align=False))
        assert err < 1e-3, (mode, err)


def test_map_merge_semantics():
    m = empty_map(256, dtype=jnp.float64)
    a = jnp.asarray(np.array([[0.1, 0.1, 0.1], [0.12, 0.11, 0.09],
                              [3.0, 3.0, 3.0]]))
    m1 = map_merge(m, a, 0.5, with_normals=False, mode="mean")
    occ = np.asarray(m1.count > 0)
    assert occ.sum() == 2                       # two occupied voxels
    # same-voxel points fused to their mean
    fused = np.asarray(m1.pos)[occ]
    i = np.argmin(fused[:, 0])
    np.testing.assert_allclose(fused[i], [0.11, 0.105, 0.095], atol=1e-12)
    assert float(np.asarray(m1.count)[occ][i]) == 2.0
    # re-merging the same points in mean mode keeps the mean, grows count
    m2 = map_merge(m1, a, 0.5, with_normals=False, mode="mean")
    occ2 = np.asarray(m2.count > 0)
    assert occ2.sum() == 2
    fused2 = np.asarray(m2.pos)[occ2]
    np.testing.assert_allclose(np.sort(fused2[:, 0]),
                               np.sort(fused[:, 0]), atol=1e-12)
    assert float(np.asarray(m2.count).max()) == 4.0
    # freeze mode: the established voxel does NOT move
    b = a.at[:2, :].add(0.2)                    # same voxels, shifted points
    m3 = map_merge(m1, b[:2], 0.5, with_normals=False, mode="freeze")
    occ3 = np.asarray(m3.count > 0)
    fused3 = np.asarray(m3.pos)[occ3]
    i3 = np.argmin(fused3[:, 0])
    np.testing.assert_allclose(fused3[i3], [0.11, 0.105, 0.095], atol=1e-12)
    # invalid rows sit OUTSIDE the valid bbox but within 3x its extent
    # (bounded sentinel — a fixed far pad destroys the cluster index)
    filled = np.asarray(m3.pos)[occ3]
    empty_rows = np.asarray(m3.pos)[~occ3]
    assert empty_rows.min() > filled.max()


def test_lru_eviction():
    """Over-capacity voxels evict stalest-first: geometry from the oldest
    merge disappears, the freshest survives."""
    rng = np.random.default_rng(0)
    m = empty_map(64, dtype=jnp.float64)
    # three merges of 60 distinct far-apart voxels each (cap 64)
    centers = [0.0, 100.0, 200.0]
    for c in centers:
        pts = jnp.asarray(c + np.arange(60)[:, None] * 1.0
                          + rng.normal(scale=0.01, size=(60, 3)) * 0)
        m = map_merge(m, pts, 0.5, with_normals=False, mode="mean")
    occ = np.asarray(m.count > 0)
    assert occ.sum() == 64
    pos = np.asarray(m.pos)[occ]
    # all 60 freshest (center 200) kept; none of the oldest (center 0) left
    assert (np.abs(pos[:, 0] - 200.0) < 60).sum() == 60
    assert (np.abs(pos[:, 0]) < 60).sum() == 0


def test_map_normals_match_surface():
    """Fused map normals agree with the analytic surface normal."""
    scans, _ = _sequence(1)
    m = empty_map(8192, dtype=jnp.float64)
    m = map_merge(m, jnp.asarray(scans[0]), 0.25, with_normals=True)
    t = np.asarray(map_target(m, True))
    v = np.asarray(m.count > 0)
    x, y, nrm = t[v, 0], t[v, 1], t[v, 3:6]
    # z = 1.5 sin(.6x) cos(.5y) -> n ~ normalize([-dz/dx, -dz/dy, 1])
    gx = 1.5 * 0.6 * np.cos(0.6 * x) * np.cos(0.5 * y)
    gy = -1.5 * 0.5 * np.sin(0.6 * x) * np.sin(0.5 * y)
    true_n = np.stack([-gx, -gy, np.ones_like(gx)], axis=1)
    true_n /= np.linalg.norm(true_n, axis=1, keepdims=True)
    dots = np.abs(np.sum(nrm * true_n, axis=1))
    assert np.median(dots) > 0.99, np.median(dots)


def test_rejects_bad_types_and_short_streams():
    with pytest.raises(ValueError):
        scan_to_map_odometry(iter(()), CFG.with_(icp_type="symmetric"))
    with pytest.raises(ValueError):
        scan_to_map_odometry(((s, None) for s in [_scene()[:100]]), CFG)
    with pytest.raises(ValueError):
        map_merge(empty_map(64), jnp.zeros((8, 3), jnp.float32), 0.5,
                  with_normals=False, mode="nonsense")
