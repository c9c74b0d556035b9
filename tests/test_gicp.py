"""Generalized-ICP (dicp_tpu.gicp) — plane-to-plane model family.

No reference counterpart (the reference offers pt2pt/pt2pl only,
dICP/ICP.py:49).  Contracts pinned:

* exact pose recovery on a curved scene (estimated AND provided normals);
* epsilon=1 degrades EXACTLY to point-to-point GN (matches the pt2pt
  solver's pose to machine precision);
* trim gate rejects outliers; prior weights flow through;
* scan driver == while driver fixed point; convergence freezing;
* reverse-mode gradients finite and nonzero; batched independence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.config import ICPConfig
from dicp_tpu.gicp import register_gicp
from dicp_tpu.registration import register


def _saddle(n=600, seed=11):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-3, 3, size=(n, 2))
    z = 0.09 * (xy[:, 0] ** 2 - xy[:, 1] ** 2)
    return np.column_stack([xy, z])


def _pair(xi, n=600, seed=11):
    scene = _saddle(n, seed)
    T_true = np.asarray(se3.vec2tran(jnp.asarray(np.asarray(xi, np.float64))))
    src = scene @ T_true[:3, :3].T + T_true[:3, 3]
    return (jnp.asarray(src[None]), jnp.asarray(scene[None]),
            jnp.eye(4)[None], T_true)


XI = [0.2, -0.15, 0.1, 0.06, -0.04, 0.08]


def test_exact_recovery_estimated_normals():
    S, Tg, Ti, T_true = _pair(XI)
    res = register_gicp(S, Tg, Ti, max_iterations=60, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[0]) @ T_true, np.eye(4),
                               atol=1e-10)
    assert bool(res.converged[0]) and float(res.cost[0]) < 1e-20


def test_provided_normals_and_6col_target():
    """Target normals from columns 3:6; source normals passed explicitly."""
    from dicp_tpu.ops.normals import estimate_normals

    S, Tg, Ti, T_true = _pair(XI)
    tgt_n = estimate_normals(Tg)
    src_n = estimate_normals(S)
    Tg6 = jnp.concatenate([Tg, tgt_n], axis=-1)
    res = register_gicp(S, Tg6, Ti, source_normals=src_n,
                        max_iterations=60, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[0]) @ T_true, np.eye(4),
                               atol=1e-10)


def test_epsilon_one_is_point_to_point():
    """epsilon=1 -> Sigma = 2I -> the Mahalanobis GN step is exactly the
    point-to-point GN step; the fixed point must match the pt2pt solver."""
    S, Tg, Ti, _ = _pair(XI)
    res_g = register_gicp(S, Tg, Ti, epsilon=1.0, max_iterations=80,
                          tolerance=1e-12)
    cfg = ICPConfig(icp_type="pt2pt", differentiable=False, driver="while",
                    max_iterations=80, tolerance=1e-12, dim=3,
                    trim_dist=100.0, loss_name="huber", loss_metric=1e9,
                    collect_histories=False)
    res_p = register(S, Tg, Ti, None, cfg)
    np.testing.assert_allclose(np.asarray(res_g.T[0]),
                               np.asarray(res_p.T[0]), atol=1e-12)


def test_trim_gate_rejects_outliers():
    S, Tg, Ti, T_true = _pair(XI)
    # plant gross outliers in the SOURCE (they correspond to nothing)
    out = jnp.asarray(np.random.default_rng(0)
                      .uniform(40, 50, size=(1, 40, 3)))
    S_o = jnp.concatenate([S, out], axis=1)
    res = register_gicp(S_o, Tg, Ti, trim_dist=2.0,
                        max_iterations=60, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[0]) @ T_true, np.eye(4),
                               atol=1e-9)


def test_prior_weights():
    """Zero-weight rows are exact no-ops: corrupt half the source but zero
    its weight — the pose must still be exact."""
    S, Tg, Ti, T_true = _pair(XI)
    n = S.shape[1]
    S_bad = S.at[:, n // 2:, :].add(5.0)
    w = jnp.ones((1, n)).at[:, n // 2:].set(0.0)
    res = register_gicp(S_bad, Tg, Ti, w, max_iterations=60,
                        tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[0]) @ T_true, np.eye(4),
                               atol=1e-9)


def test_scan_matches_while():
    S, Tg, Ti, _ = _pair(XI)
    r_w = register_gicp(S, Tg, Ti, max_iterations=40, tolerance=1e-12)
    r_s = register_gicp(S, Tg, Ti, max_iterations=40, tolerance=1e-12,
                        differentiable=True)
    np.testing.assert_allclose(np.asarray(r_s.T), np.asarray(r_w.T),
                               atol=1e-12)
    assert float(r_s.iterations[0]) == float(r_w.iterations[0])


def test_batched_independent():
    S0, Tg, Ti, T0 = _pair(XI)
    S1, _, _, T1 = _pair([-0.15, 0.2, -0.08, -0.03, 0.05, -0.06])
    S = jnp.concatenate([S0, S1])
    TG = jnp.concatenate([Tg, Tg])
    TI = jnp.concatenate([Ti, Ti])
    res = register_gicp(S, TG, TI, max_iterations=60, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[0]) @ T0, np.eye(4),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.T[1]) @ T1, np.eye(4),
                               atol=1e-9)
    # batch == serial (freezing does not cross-couple elements)
    solo = register_gicp(S1, Tg, Ti, max_iterations=60, tolerance=1e-12)
    np.testing.assert_allclose(np.asarray(res.T[1]), np.asarray(solo.T[0]),
                               atol=1e-12)


def test_gradients():
    S, Tg, Ti, _ = _pair(XI, n=200)

    def loss(a):
        return jnp.sum(register_gicp(a, Tg, Ti, max_iterations=10,
                                     tolerance=1e-12,
                                     differentiable=True).T)

    g = np.asarray(jax.grad(loss)(S))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_ift_forward_matches_while():
    from dicp_tpu.gicp import register_gicp_ift

    S, Tg, Ti, _ = _pair(XI, n=300)
    r_ift = register_gicp_ift(S, Tg, Ti, max_iterations=60, tolerance=1e-13)
    r_w = register_gicp(S, Tg, Ti, max_iterations=60, tolerance=1e-13)
    np.testing.assert_array_equal(np.asarray(r_ift.T), np.asarray(r_w.T))
    assert bool(r_ift.converged[0])


def test_ift_gradients_match_unrolled():
    """One 6x6 adjoint solve == reverse-mode through every iteration, at a
    tight fixed point (the dicp_tpu.ift contract, extended to GICP)."""
    from dicp_tpu.gicp import register_gicp_ift

    S, Tg, Ti, _ = _pair(XI, n=300)
    g_ift = np.asarray(jax.grad(
        lambda a: jnp.sum(register_gicp_ift(a, Tg, Ti, max_iterations=60,
                                            tolerance=1e-13).T))(S))
    g_unr = np.asarray(jax.grad(
        lambda a: jnp.sum(register_gicp(a, Tg, Ti, max_iterations=25,
                                        tolerance=1e-13,
                                        differentiable=True).T))(S))
    assert np.all(np.isfinite(g_ift)) and np.abs(g_ift).max() > 0
    np.testing.assert_allclose(g_ift, g_unr, rtol=0,
                               atol=2e-6 * np.abs(g_unr).max())


def test_ift_gradients_into_target_and_weight():
    from dicp_tpu.gicp import register_gicp_ift

    S, Tg, Ti, _ = _pair(XI, n=200)
    w = jnp.ones((1, 200))
    for arg, fn in [("target", lambda t: jnp.sum(register_gicp_ift(
            S, t, Ti, w, max_iterations=60, tolerance=1e-13).T)),
                    ("weight", lambda ww: jnp.sum(register_gicp_ift(
            S, Tg, Ti, ww, max_iterations=60, tolerance=1e-13).T))]:
        g = np.asarray(jax.grad(fn)(Tg if arg == "target" else w))
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0, arg


def test_validation():
    with pytest.raises(ValueError, match="batched"):
        register_gicp(jnp.zeros((8, 3)), jnp.zeros((8, 3)), jnp.eye(4))


def test_f32_realistic_radius_no_nan():
    """Points at ~50 m radius in f32: the H rotation block scales with
    n*r^2 vs the translation block's n (1e4+ diagonal disparity).  The
    un-equilibrated Schur solve cancels catastrophically here (det -> 0 ->
    NaN, ops/smallsolve.solve_spd docstring); the solver must use the
    Jacobi-equilibrated form (code-review r3)."""
    rng = np.random.default_rng(3)
    xy = rng.uniform(-50, 50, size=(800, 2))
    z = 0.02 * (xy[:, 0] ** 2 - xy[:, 1] ** 2) / 50.0
    scene = np.column_stack([xy, z]).astype(np.float32)
    xi = [0.3, -0.2, 0.1, 0.004, -0.003, 0.006]
    T_true = np.asarray(se3.vec2tran(jnp.asarray(np.asarray(xi, np.float64))),
                        np.float64)
    src = (scene.astype(np.float64) @ T_true[:3, :3].T
           + T_true[:3, 3]).astype(np.float32)
    res = register_gicp(jnp.asarray(src[None]), jnp.asarray(scene[None]),
                        jnp.eye(4, dtype=jnp.float32)[None],
                        max_iterations=60, tolerance=1e-7)
    T = np.asarray(res.T[0], np.float64)
    assert np.all(np.isfinite(T))
    # register_gicp maps source -> target, so T inverts the src = T_true @
    # scene construction: T @ T_true == I (same convention as the recovery
    # tests above)
    err = np.asarray(se3.tran2vec(jnp.asarray(T @ T_true)))
    assert np.linalg.norm(err) < 5e-4, (np.linalg.norm(err), err)


def test_all_trimmed_no_nan():
    """A trim gate that rejects EVERY correspondence must leave the pose at
    T_init with finite values (H = 0 + Levenberg jitter; the f32 underflow
    mode flagged in code-review r3), matching the reference's empty-input
    degradation semantics (dICP/ICP.py:331-346)."""
    S, Tg, Ti, _ = _pair(XI, n=200)
    S32 = jnp.asarray(np.asarray(S, np.float32))
    Tg32 = jnp.asarray(np.asarray(Tg, np.float32))
    Ti32 = jnp.asarray(np.asarray(Ti, np.float32))
    res = register_gicp(S32, Tg32, Ti32, trim_dist=1e-9, max_iterations=10,
                        tolerance=1e-7)
    T = np.asarray(res.T[0])
    assert np.all(np.isfinite(T))
    np.testing.assert_allclose(T, np.asarray(Ti32[0]), atol=1e-5)


def test_mahalanobis_ne_chunked_matches_flat():
    """The two-level accumulator (n > chunk) must agree with the flat einsum
    in f64 (where accumulation order is harmless)."""
    from dicp_tpu.gicp import _mahalanobis_ne

    rng = np.random.default_rng(7)
    n = 5000
    J = jnp.asarray(rng.standard_normal((n, 3, 6)))
    A = rng.standard_normal((n, 3, 3))
    M = jnp.asarray(np.einsum("nij,nkj->nik", A, A) + 3 * np.eye(3))
    r = jnp.asarray(rng.standard_normal((n, 3)))
    w = jnp.asarray(rng.uniform(0, 1, n))
    H1, g1, Mr1 = _mahalanobis_ne(J, M, r, w, chunk=512)
    H2, g2, Mr2 = _mahalanobis_ne(J, M, r, w, chunk=10**9)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Mr1), np.asarray(Mr2), rtol=1e-12)
