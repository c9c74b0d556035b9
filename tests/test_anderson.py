"""Anderson-accelerated ICP driver (dicp_tpu.anderson).

Contracts: same fixed point as the plain while driver, FEWER iterations on
the slow (pt2pt) problems it exists for, batch == serial independence, and
the safeguard never diverging (worst case = plain ICP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.anderson import register_anderson_jit
from dicp_tpu.config import ICPConfig
from dicp_tpu.registration import register_jit


def _cfg(icp_type="pt2pt", dim=2, loss="huber", max_iterations=100):
    return ICPConfig(icp_type=icp_type, differentiable=False, driver="while",
                     max_iterations=max_iterations, tolerance=1e-10, dim=dim,
                     trim_dist=5.0, loss_name=loss, loss_metric=1.0,
                     collect_histories=False)


@pytest.fixture
def pair(test_pair):
    scan, mp = test_pair
    return (jnp.asarray(scan[:, :3])[None], jnp.asarray(mp)[None],
            jnp.asarray(np.eye(4))[None])


def test_same_fixed_point_fewer_iterations(pair):
    """pt2pt (the reference's 25-27-iteration config): identical transform,
    substantially fewer iterations (measured 10 vs 25)."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pt")
    plain = register_jit(src, tgt, ti, None, cfg=cfg)
    aa = register_anderson_jit(src, tgt, ti, None, cfg=cfg)
    np.testing.assert_allclose(np.asarray(aa.T), np.asarray(plain.T),
                               atol=1e-9)
    assert bool(aa.converged[0])
    assert float(aa.iterations[0]) <= 0.6 * float(plain.iterations[0]), (
        float(aa.iterations[0]), float(plain.iterations[0]))


def test_pt2pl_converges_to_reference_truth(pair):
    """pt2pl: AA may cost a couple of evaluations (near-quadratic problem)
    but must reach the same transform and stay within max_iterations."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pl")
    plain = register_jit(src, tgt, ti, None, cfg=cfg)
    aa = register_anderson_jit(src, tgt, ti, None, cfg=cfg)
    np.testing.assert_allclose(np.asarray(aa.T), np.asarray(plain.T),
                               atol=1e-9)
    assert bool(aa.converged[0])
    assert float(aa.iterations[0]) <= float(plain.iterations[0]) + 3


def test_batch_equals_serial(pair):
    """Elements accelerate / reject / converge independently."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pt")
    offs = [0.0, 0.3, -0.2]
    srcs = jnp.concatenate([src + o for o in offs], axis=0)
    tgts = jnp.concatenate([tgt] * 3, axis=0)
    tis = jnp.concatenate([ti] * 3, axis=0)
    batch = register_anderson_jit(srcs, tgts, tis, None, cfg=cfg)
    for i, o in enumerate(offs):
        solo = register_anderson_jit(src + o, tgt, ti, None, cfg=cfg)
        np.testing.assert_allclose(np.asarray(batch.T[i]),
                                   np.asarray(solo.T[0]), atol=1e-12)
        assert float(batch.iterations[i]) == float(solo.iterations[0])


def test_3d_recovers_ground_truth():
    """3-D synthetic surface with analytic normals: AA recovers the exact
    transform on both residual types."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(400, 3))
    pts[:, 2] = 0.3 * np.sin(pts[:, 0] * 2) + 0.2 * pts[:, 1] ** 2
    nrm = np.stack([-0.6 * np.cos(pts[:, 0] * 2), -0.4 * pts[:, 1],
                    np.ones(400)], 1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tgt = jnp.asarray(np.hstack([pts, nrm]))[None]
    T_true = np.asarray(se3.vec2tran(
        jnp.asarray([0.25, -0.2, 0.1, 0.05, -0.08, 0.3])))
    Ti = np.linalg.inv(T_true)
    src = jnp.asarray(pts @ Ti[:3, :3].T + Ti[:3, 3])[None]
    ti = jnp.asarray(np.eye(4))[None]
    for icp_type in ("pt2pt", "pt2pl"):
        cfg = _cfg(icp_type, dim=3, loss="cauchy", max_iterations=200)
        aa = register_anderson_jit(src, tgt, ti, None, cfg=cfg)
        assert bool(aa.converged[0]), icp_type
        assert np.abs(np.asarray(aa.T[0]) - T_true).max() < 1e-8, icp_type


def test_safeguard_never_worse_than_budget(pair):
    """A far initialization: the energy safeguard must keep AA convergent
    wherever plain ICP converges (worst case = plain with wasted evals)."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pt", max_iterations=200)
    T0 = np.eye(4)
    T0[:3, 3] = [1.5, -1.0, 0.0]
    ti_far = jnp.asarray(T0)[None]
    plain = register_jit(src, tgt, ti_far, None, cfg=cfg)
    aa = register_anderson_jit(src, tgt, ti_far, None, cfg=cfg)
    assert bool(plain.converged[0])
    assert bool(aa.converged[0])
    np.testing.assert_allclose(np.asarray(aa.T), np.asarray(plain.T),
                               atol=1e-8)


def test_differentiable_cfg_rejected(pair):
    src, tgt, ti = pair
    cfg = ICPConfig(icp_type="pt2pt", differentiable=True, dim=2,
                    trim_dist=5.0, loss_name="huber", loss_metric=1.0)
    with pytest.raises(ValueError, match="inference driver"):
        register_anderson_jit(src, tgt, ti, None, cfg=cfg)


def test_ift_with_anderson_forward(pair):
    """cfg.anderson_m routes the IFT *forward* through the AA driver: same
    fixed point -> same implicit gradients, fewer forward iterations.  This
    is the serving-grad combination for slow (pt2pt) configs."""
    from dicp_tpu.ift import register_ift

    src, tgt, ti = pair
    base = ICPConfig(icp_type="pt2pt", differentiable=True, driver="while",
                     max_iterations=100, tolerance=1e-10, dim=2,
                     trim_dist=5.0, loss_name="huber", loss_metric=1.0,
                     collect_histories=False)
    aa_cfg = base.with_(anderson_m=4)

    r_plain = register_ift(src, tgt, ti, None, base)
    r_aa = register_ift(src, tgt, ti, None, aa_cfg)
    np.testing.assert_allclose(np.asarray(r_aa.T), np.asarray(r_plain.T),
                               atol=1e-9)
    assert float(r_aa.iterations[0]) < float(r_plain.iterations[0])

    g_plain = jax.grad(
        lambda a: jnp.sum(register_ift(a, tgt, ti, None, base).T))(src)
    g_aa = jax.grad(
        lambda a: jnp.sum(register_ift(a, tgt, ti, None, aa_cfg).T))(src)
    gp, ga = np.asarray(g_plain), np.asarray(g_aa)
    assert np.all(np.isfinite(ga)) and np.abs(ga).max() > 0
    np.testing.assert_allclose(ga, gp, rtol=1e-6, atol=1e-12)


def test_config_validation():
    with pytest.raises(ValueError, match="collect_histories"):
        ICPConfig(anderson_m=4)          # default collect_histories=True
    with pytest.raises(ValueError, match="const_iter"):
        ICPConfig(anderson_m=4, collect_histories=False, const_iter=True)
    with pytest.raises(ValueError, match=">= 0"):
        ICPConfig(anderson_m=-1)


def test_register_routes_anderson(pair):
    """register() with cfg.anderson_m > 0 dispatches to the AA driver (the
    public class/config path, not just the direct function)."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pt").with_(anderson_m=4)
    direct = register_anderson_jit(src, tgt, ti, None, cfg=_cfg("pt2pt"))
    routed = register_jit(src, tgt, ti, None, cfg=cfg)
    np.testing.assert_allclose(np.asarray(routed.T), np.asarray(direct.T),
                               atol=1e-12)
    assert float(routed.iterations[0]) == float(direct.iterations[0])


def test_weighted_and_stats(pair):
    """Prior weights flow through; stats dict fields populated."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pl")
    w = jnp.ones(src.shape[:2], src.dtype).at[:, :5].set(0.0)
    aa = register_anderson_jit(src, tgt, ti, w, cfg=cfg)
    assert bool(aa.converged[0])
    assert float(aa.matched_ratio[0]) > 0.5
    assert np.all(np.isfinite(np.asarray(aa.pc)))


def test_converging_step_is_applied(pair):
    """A tolerance loose enough that the FIRST plain-GN step converges: the
    plain while driver applies that step before freezing, so the AA driver
    must return the identical post-step pose — not freeze at T_init
    (code-review r3: freezing at the pre-update iterate lagged the plain
    driver by one sub-tolerance step)."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pl", max_iterations=5)
    cfg = cfg.with_(tolerance=10.0)  # first step norm ~O(1) < 10
    plain = register_jit(src, tgt, ti, None, cfg=cfg)
    aa = register_anderson_jit(src, tgt, ti, None, cfg=cfg)
    assert bool(aa.converged[0]) and bool(plain.converged[0])
    assert float(aa.iterations[0]) == float(plain.iterations[0]) == 1.0
    # identical single plain-GN step -> identical pose, and NOT T_init
    np.testing.assert_allclose(np.asarray(aa.T), np.asarray(plain.T),
                               atol=1e-12)
    assert not np.allclose(np.asarray(aa.T), np.asarray(ti), atol=1e-6)


def test_costs_never_rejection_sentinel(pair):
    """res.costs must be the last real evaluated energy, never the
    finfo.max rejection sentinel (code-review r3) — exercised with an
    aggressive cap (rejection-prone) and a budget that exits unconverged."""
    src, tgt, ti = pair
    cfg = _cfg("pt2pt", max_iterations=3)
    aa = register_anderson_jit(src, tgt, ti, None, cfg=cfg, cap=100.0)
    c = np.asarray(aa.costs)
    assert np.all(np.isfinite(c))
    assert np.all(c < 1e12), c
