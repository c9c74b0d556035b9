"""Coarse-to-fine multiscale ICP (dicp_tpu.multiscale).

No reference counterpart (the reference registers one scale,
dICP/ICP.py:49); contracts pinned here:

* subsample_packed re-packing invariants in both count regimes;
* per-voxel weights are EXACTLY the sum of member weights;
* the pyramid reaches the same fixed point as a single-scale solve, with
  fewer final-level (full-resolution) iterations;
* batching, gradients (with and without the warm-up stop_gradient), and
  config validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu.config import ICPConfig
from dicp_tpu.multiscale import (ScaleLevel, register_multiscale,
                                 subsample_packed, _downsample_cloud)
from dicp_tpu.registration import register
from dicp_tpu import se3


def _scene(n_per_plane=120, seed=7):
    """Three noisy orthogonal planes with exact unit normals, (3n, 6)."""
    rng = np.random.default_rng(seed)
    normals = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    pts, nrm = [], []
    for k in range(3):
        uv = rng.uniform(-5, 5, size=(n_per_plane, 2))
        basis = np.eye(3)[[i for i in range(3) if i != np.argmax(normals[k])]]
        pts.append(uv @ basis + normals[k] * (2.0 + k))
        nrm.append(np.tile(normals[k], (n_per_plane, 1)))
    return np.hstack([np.vstack(pts), np.vstack(nrm)])


def _pair(xi, seed=7):
    scene = _scene(seed=seed)
    T_true = np.asarray(se3.vec2tran(jnp.asarray(np.asarray(xi, np.float64))))
    src = scene[:, :3] @ T_true[:3, :3].T + T_true[:3, 3]
    return src, scene, T_true


_CFG = ICPConfig(icp_type="pt2pl", differentiable=False, driver="while",
                 max_iterations=60, tolerance=1e-12, dim=3, trim_dist=20.0,
                 loss_name="cauchy", loss_metric=1.0,
                 collect_histories=False)
_LEVELS = (ScaleLevel(1.0, 128, 128, 20, 1e-4, trim_dist=20.0,
                      nn_method="dense"),  # per-level backend override
           ScaleLevel(0.3, 384, 384, 20, 1e-6, trim_dist=20.0),
           ScaleLevel(0.0, 0, 0, 40, 1e-12))


def test_subsample_under_capacity():
    """count <= cap: identity on valid rows; padding duplicates the last
    VALID row (usable as hard-NN target padding) at zero weight."""
    pts = jnp.asarray(np.arange(30, dtype=np.float64).reshape(10, 3))
    w = jnp.asarray(np.arange(1.0, 11.0))
    p, ww = subsample_packed(pts, w, jnp.asarray(4), 6)
    np.testing.assert_array_equal(np.asarray(p[:4]), np.asarray(pts[:4]))
    np.testing.assert_array_equal(np.asarray(p[4:]),
                                  np.broadcast_to(np.asarray(pts[3]), (2, 3)))
    np.testing.assert_array_equal(np.asarray(ww), [1, 2, 3, 4, 0, 0])


def test_subsample_over_capacity():
    """count > cap: every slot holds a distinct valid row with its own
    weight — a stride over the packed order, not a spatial head-crop."""
    pts = jnp.asarray(np.arange(60, dtype=np.float64).reshape(20, 3))
    w = jnp.asarray(np.arange(1.0, 21.0))
    p, ww = subsample_packed(pts, w, jnp.asarray(17), 8)
    assert np.all(np.asarray(ww) > 0)
    rows = {tuple(r) for r in np.asarray(p)}
    assert len(rows) == 8  # distinct
    valid = {tuple(r) for r in np.asarray(pts[:17])}
    assert rows <= valid
    # stride spans the full packed range, not just its head
    assert tuple(np.asarray(pts[0])) in rows
    assert max(int(r[0]) for r in rows) >= 12 * 3


def test_voxel_weight_sum_exact():
    """Per-voxel weight == SUM of member weights (mean * count), so the
    coarse level solves the same weighted objective on centroids."""
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.uniform(-2, 2, size=(200, 3)))
    w = jnp.asarray(rng.uniform(0.1, 3.0, size=(200,)))
    pts, wl = _downsample_cloud(cloud, w, 0.5, 256)
    np.testing.assert_allclose(float(jnp.sum(wl)), float(jnp.sum(w)),
                               rtol=1e-12)


def test_normals_renormalized():
    """pt2pl targets keep unit normals through the voxel average; a voxel
    whose member normals cancel keeps the zero normal (solver no-op)."""
    cloud = np.zeros((4, 6))
    cloud[:, :3] = [[0.1, 0.1, 0], [0.15, 0.12, 0],   # same voxel, tilted
                    [3.0, 3.0, 0], [3.1, 3.05, 0]]    # same voxel, cancel
    cloud[0, 3:] = [1, 0, 0]
    cloud[1, 3:] = [0, 1, 0]
    cloud[2, 3:] = [0, 0, 1]
    cloud[3, 3:] = [0, 0, -1]
    pts, w = _downsample_cloud(jnp.asarray(cloud), None, 1.0, 4)
    lens = np.linalg.norm(np.asarray(pts[:, 3:6]), axis=1)
    occupied = np.asarray(w) > 0
    assert occupied.sum() == 2
    np.testing.assert_allclose(sorted(lens[occupied]), [0.0, 1.0], atol=1e-12)


def test_pyramid_matches_single_scale_fixed_point():
    src, tgt, T_true = _pair([0.3, -0.2, 0.4, 0.15, -0.1, 0.2])
    S, Tg, Ti = jnp.asarray(src[None]), jnp.asarray(tgt[None]), jnp.eye(4)[None]
    ms = register_multiscale(S, Tg, Ti, None, _CFG, _LEVELS)
    ss = register(S, Tg, Ti, None, _CFG)
    # both at the true pose (T_result = T_true^{-1})
    for T in (ms.result.T[0], ss.T[0]):
        np.testing.assert_allclose(np.asarray(T) @ T_true, np.eye(4),
                                   atol=1e-9)
    # the pyramid's full-resolution polish is cheaper than solving from
    # scratch at full resolution
    assert float(ms.level_iterations[-1, 0]) < float(ss.iterations[0])
    assert ms.level_T.shape == (3, 1, 4, 4)
    assert bool(ms.result.converged[0])


def test_batched_independent():
    src0, tgt, T0 = _pair([0.3, -0.2, 0.4, 0.15, -0.1, 0.2])
    src1, _, T1 = _pair([-0.25, 0.3, -0.1, -0.05, 0.12, -0.15])
    S = jnp.asarray(np.stack([src0, src1]))
    Tg = jnp.asarray(np.stack([tgt, tgt]))
    Ti = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    ms = register_multiscale(S, Tg, Ti, None, _CFG, _LEVELS)
    np.testing.assert_allclose(np.asarray(ms.result.T[0]) @ T0, np.eye(4),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ms.result.T[1]) @ T1, np.eye(4),
                               atol=1e-9)


def test_weighted_pyramid():
    """Prior weights ride through the voxel levels (sum-exact) and still
    produce the correct pose."""
    src, tgt, T_true = _pair([0.2, -0.1, 0.3, 0.1, -0.05, 0.15])
    w = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2.0,
                                                     size=(1, src.shape[0])))
    S, Tg, Ti = jnp.asarray(src[None]), jnp.asarray(tgt[None]), jnp.eye(4)[None]
    ms = register_multiscale(S, Tg, Ti, w, _CFG, _LEVELS)
    np.testing.assert_allclose(np.asarray(ms.result.T[0]) @ T_true,
                               np.eye(4), atol=1e-9)


def test_gradients_warmup_stop():
    """Differentiable pyramid: grads w.r.t. the source are finite AND
    nonzero; with the warm-up stop_gradient they equal the final level's
    own unrolled gradients started from the handoff pose."""
    src, tgt, _ = _pair([0.15, -0.1, 0.2, 0.05, -0.03, 0.08])
    cfg = _CFG.with_(differentiable=True, driver="scan", max_iterations=12,
                     tolerance=1e-12)
    levels = (ScaleLevel(0.8, 128, 128, 6, 1e-5, trim_dist=20.0),
              ScaleLevel(0.0, 0, 0, 8, 1e-12))
    S, Tg, Ti = jnp.asarray(src[None]), jnp.asarray(tgt[None]), jnp.eye(4)[None]

    def loss(a):
        return jnp.sum(register_multiscale(a, Tg, Ti, None, cfg, levels)
                       .result.T)

    g = np.asarray(jax.grad(loss)(S))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    # reference: run the coarse level alone, then differentiate the final
    # level only, from the (constant) handoff pose
    warm = register_multiscale(S, Tg, Ti, None,
                               cfg.with_(differentiable=False,
                                         driver="while"),
                               levels[:1]).result.T
    fcfg = cfg.with_(max_iterations=8, tolerance=1e-12)
    g_ref = np.asarray(jax.grad(
        lambda a: jnp.sum(register(a, Tg, jax.lax.stop_gradient(warm), None,
                                   fcfg).T))(S))
    np.testing.assert_allclose(g, g_ref, rtol=1e-6, atol=1e-12)


def test_gradients_full_unroll():
    """warmup_stop_gradient=False differentiates through every level."""
    src, tgt, _ = _pair([0.1, -0.05, 0.1, 0.03, -0.02, 0.05])
    cfg = _CFG.with_(differentiable=True, driver="scan", max_iterations=6,
                     tolerance=1e-12)
    levels = (ScaleLevel(0.8, 128, 128, 4, 1e-5, trim_dist=20.0),
              ScaleLevel(0.0, 0, 0, 6, 1e-12))
    S, Tg, Ti = jnp.asarray(src[None]), jnp.asarray(tgt[None]), jnp.eye(4)[None]
    g = np.asarray(jax.grad(
        lambda a: jnp.sum(register_multiscale(a, Tg, Ti, None, cfg, levels,
                                              warmup_stop_gradient=False)
                          .result.T))(S))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_validation():
    S = jnp.zeros((1, 8, 3))
    Tg = jnp.zeros((1, 8, 6))
    Ti = jnp.eye(4)[None]
    with pytest.raises(ValueError, match="non-empty"):
        register_multiscale(S, Tg, Ti, None, _CFG, ())
    with pytest.raises(ValueError, match="slot budgets"):
        register_multiscale(S, Tg, Ti, None, _CFG,
                            (ScaleLevel(1.0, 0, 0, 5, 1e-4),))
    with pytest.raises(ValueError, match="PRNG key"):
        register_multiscale(
            S, Tg, Ti, None,
            _CFG.with_(differentiable=True, use_gumbel=True, driver="scan"),
            (ScaleLevel(0.0, 0, 0, 5, 1e-4),))
