"""Odometry / pose-graph / voxel tests (application layer; no reference
counterpart — BASELINE.json configs #4 and #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.config import ICPConfig
from dicp_tpu.odometry import (
    PoseGraph,
    ate,
    compose_chain,
    odometry,
    odometry_pose_graph,
    pose_graph_optimize,
)
from dicp_tpu.ops.voxel import voxel_downsample

CFG = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=30,
                tolerance=1e-10, dim=2, trim_dist=5.0,
                loss_name="huber", loss_metric=1.0)


def _make_sequence(target_np, n_scans=6, step_xi=(0.05, 0.08, 0, 0, 0, 0.02)):
    """Synthesize a scan sequence by moving the map cloud through known poses.

    scan_i = map points expressed in frame_i, where frame_i = world @ step^i.
    Normals are rotated along.  Ground-truth pose of frame_i is step^i.
    """
    step = np.asarray(se3.vec2tran(jnp.asarray(np.array(step_xi, dtype=np.float64))))
    pts = target_np[:, :3]
    nrm = target_np[:, 3:6]
    scans, poses = [], []
    T = np.eye(4)
    for _ in range(n_scans):
        Tinv = np.linalg.inv(T)
        p_i = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        n_i = nrm @ Tinv[:3, :3].T
        scans.append(np.hstack([p_i, n_i]))
        poses.append(T.copy())
        T = T @ step
    return jnp.asarray(np.stack(scans)), jnp.asarray(np.stack(poses))


def test_compose_chain():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(5, 6)) * 0.1
    rel = jax.vmap(se3.vec2tran)(jnp.asarray(xs))
    poses = compose_chain(rel)
    expect = np.eye(4)
    np.testing.assert_allclose(np.asarray(poses[0]), expect, atol=1e-14)
    for i in range(5):
        expect = expect @ np.asarray(rel[i])
        np.testing.assert_allclose(np.asarray(poses[i + 1]), expect, atol=1e-12)


def test_odometry_recovers_trajectory(target_np):
    scans, poses_true = _make_sequence(target_np)
    res = odometry(scans, CFG)
    assert bool(jnp.all(res.converged))
    err = ate(res.poses, poses_true, align=False)
    assert float(err) < 1e-6, float(err)


def test_ate_alignment_invariance(target_np):
    scans, poses_true = _make_sequence(target_np)
    res = odometry(scans, CFG)
    # global rigid offset of the prediction is absorbed by alignment
    off = se3.vec2tran(jnp.asarray(np.array([5.0, -2.0, 0, 0, 0, 0.7])))
    shifted = jnp.einsum("ij,sjk->sik", off, res.poses)
    assert float(ate(shifted, poses_true, align=True)) < 1e-5
    assert float(ate(shifted, poses_true, align=False)) > 1.0


def test_pose_graph_closes_drift(target_np):
    """Inject drift into odometry edges; a loop-closure edge pulls the
    trajectory back (classic pose-graph sanity check)."""
    scans, poses_true = _make_sequence(target_np, n_scans=5)
    res = odometry(scans, CFG)
    S = res.poses.shape[0]

    # corrupt one odometry edge
    bad = res.rel_transforms.at[2].set(
        res.rel_transforms[2] @ se3.vec2tran(jnp.asarray(np.array([0.1, 0.05, 0, 0, 0, 0.03]))))
    poses_bad = compose_chain(bad)
    assert float(ate(poses_bad, poses_true, align=False)) > 0.05

    # graph: odometry edges with the corrupted one down-weighted, plus a
    # strong loop-closure edge — the optimizer should push the correction
    # into the low-info edge and recover the trajectory.
    i_odo = jnp.arange(S - 1, dtype=jnp.int32)
    ei = jnp.concatenate([i_odo, jnp.array([0], jnp.int32)])
    ej = jnp.concatenate([i_odo + 1, jnp.array([S - 1], jnp.int32)])
    t_truth_edge = se3.tran_inv(poses_true[0]) @ poses_true[S - 1]
    t_meas = jnp.concatenate([bad, t_truth_edge[None]])
    info = jnp.concatenate([jnp.ones(S - 1).at[2].set(0.01), jnp.array([100.0])])
    graph = PoseGraph(ei, ej, t_meas, info)

    poses_opt, cost = pose_graph_optimize(poses_bad, graph, iterations=15)
    assert float(ate(poses_opt, poses_true, align=False)) < \
        float(ate(poses_bad, poses_true, align=False)) * 0.2


def test_odometry_pose_graph_with_loop_closures(target_np):
    scans, poses_true = _make_sequence(target_np, n_scans=5)
    res = odometry_pose_graph(
        scans, CFG, loop_closures=(jnp.array([0]), jnp.array([4])))
    assert float(ate(res.poses, poses_true, align=False)) < 1e-5


def test_voxel_downsample_basic():
    pts = jnp.asarray(np.array([
        [0.1, 0.1, 0.1],
        [0.2, 0.2, 0.2],   # same voxel as above at size 0.5
        [1.1, 0.0, 0.0],   # different voxel
        [1.2, 0.1, 0.0],   # same voxel as previous
        [5.0, 5.0, 5.0],
    ], dtype=np.float64))
    out = voxel_downsample(pts, 0.5)
    assert int(out.count) == 3
    w = np.asarray(out.weight)
    assert w[: 3].tolist() == [2.0, 2.0, 1.0] or sorted(w[:3].tolist()) == [1.0, 2.0, 2.0]
    assert np.all(w[3:] == 0)
    # centroids: some slot holds the mean of the first two points
    p = np.asarray(out.points[:3])
    assert np.any(np.all(np.isclose(p, [0.15, 0.15, 0.15]), axis=-1))


def test_voxel_downsample_jit_and_register(target_np):
    pts = jnp.asarray(target_np[:, :3])
    out = jax.jit(lambda p: voxel_downsample(p, 0.4))(pts)
    assert int(out.count) <= pts.shape[0]
    assert np.all(np.isfinite(np.asarray(out.points)))
    # downsampled cloud + weights feed the solver directly
    from dicp_tpu.registration import register_jit
    cfg = CFG.with_(icp_type="pt2pt", max_iterations=10, tolerance=1e-8)
    res = register_jit(out.points[None], pts[None, :, :3],
                       jnp.eye(4, dtype=pts.dtype)[None],
                       out.weight[None], cfg=cfg)
    assert np.all(np.isfinite(np.asarray(res.T)))


def test_resumable_odometry_matches_oneshot(tmp_path, target_np):
    """Kill-and-resume produces the identical trajectory as one shot."""
    import os

    from dicp_tpu.odometry import odometry, resumable_odometry

    mp = target_np.astype(np.float32)
    S = 9
    step = se3.vec2tran(jnp.asarray([0.05, 0.08, 0, 0, 0, 0.02], jnp.float32))
    T = np.eye(4, dtype=np.float32)
    scans = []
    for _ in range(S):
        Ti = np.linalg.inv(T)
        scans.append(np.hstack([mp[:, :3] @ Ti[:3, :3].T + Ti[:3, 3],
                                mp[:, 3:6] @ Ti[:3, :3].T]).astype(np.float32))
        T = T @ np.asarray(step)
    scans_j = jnp.asarray(np.stack(scans))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=30,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    oneshot = odometry(scans_j, cfg)

    # simulate an interrupted run: process only the first 2 chunks (chunk=3
    # -> 6 of 8 pairs), "crash", then resume from the checkpoint
    ckpt = os.path.join(tmp_path, "odo.npz")
    partial = resumable_odometry(scans_j[:7], cfg, checkpoint_path=ckpt, chunk=3)
    state_mid = np.load(ckpt)
    assert int(state_mid["step"]) == 6

    resumed = resumable_odometry(scans_j, cfg, checkpoint_path=ckpt, chunk=3)
    np.testing.assert_allclose(np.asarray(resumed.poses),
                               np.asarray(oneshot.poses), atol=1e-6)
    assert bool(jnp.all(resumed.converged))
    del partial


def test_odometry_symmetric(planes_scene):
    """Symmetric ICP through the odometry entry point (code-review r3: the
    unconditional source[:, :, :3] slice stripped the source normals the
    symmetric residual requires, making it unusable here)."""
    scene = np.asarray(planes_scene)               # (600, 6) with normals
    xi = jnp.asarray(np.array([0.02, 0.01, 0.005, 0.002, 0.001, 0.004]))
    T_step = np.asarray(se3.vec2tran(xi))
    scans = []
    T = np.eye(4)
    for _ in range(4):
        Ti = np.linalg.inv(T)
        pts = scene[:, :3] @ Ti[:3, :3].T + Ti[:3, 3]
        nrm = scene[:, 3:6] @ Ti[:3, :3].T
        scans.append(np.hstack([pts, nrm]))
        T = T @ T_step
    cfg = ICPConfig(icp_type="symmetric", differentiable=False,
                    max_iterations=40, tolerance=1e-12, dim=3,
                    trim_dist=2.0, loss_name="huber", loss_metric=1.0)
    res = odometry(jnp.asarray(np.stack(scans)), cfg)
    step_inv = np.asarray(se3.tran_inv(jnp.asarray(T_step)))
    errs = [np.linalg.norm(np.asarray(se3.tran2vec(jnp.asarray(
        np.asarray(r) @ step_inv)))) for r in np.asarray(res.rel_transforms)]
    assert max(errs) < 1e-8, errs
