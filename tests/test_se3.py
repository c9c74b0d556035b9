"""Unit tests for dicp_tpu.se3 (replaces the pylgmath ground-truth helpers
used by the reference suite, tests/test_ICP.py:11-13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3


def test_skew_vee_roundtrip():
    v = jnp.array([[1.0, -2.0, 3.0], [0.0, 0.5, -0.25]])
    m = se3.skew(v)
    assert m.shape == (2, 3, 3)
    np.testing.assert_allclose(se3.vee(m), v)
    # skew(v) @ u == cross(v, u)
    u = jnp.array([0.3, 0.7, -1.1])
    np.testing.assert_allclose(m[0] @ u, jnp.cross(v[0], u), atol=1e-15)


def test_exp_so3_matches_scipy_expm():
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    for scale in [1e-9, 1e-4, 0.1, 1.0, 3.0]:
        phi = rng.normal(size=3) * scale
        ours = np.asarray(se3.exp_so3(jnp.array(phi)))
        ref = expm(np.asarray(se3.skew(jnp.array(phi))))
        # scipy expm's scaling-and-squaring carries ~1e-9 symmetric-part noise
        # at small angles; Rodrigues is the exact one here.
        np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_log_exp_roundtrip():
    rng = np.random.default_rng(1)
    phis = rng.normal(size=(50, 3))
    # keep angles inside the principal domain (0, pi) where log(exp(.)) = id
    norms = np.linalg.norm(phis, axis=-1, keepdims=True)
    phis = phis / norms * (norms % 3.0)
    phis[0] = [1e-12, 0, 0]
    phis[1] = [0, 0, 3.14]  # near pi
    rot = se3.exp_so3(jnp.array(phis))
    back = se3.log_so3(rot)
    np.testing.assert_allclose(np.asarray(back), phis, atol=1e-6)


def test_vec2tran_matches_pylgmath_convention():
    """Pin the exact ground-truth transform of the reference tests:
    xi = [1, 1, 0, 0, 0, 0.1] -> T with the values recorded in BASELINE.md."""
    xi = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 0.1])
    T_st = se3.vec2tran(xi)
    T_ts = se3.tran_inv(T_st)
    # exact values from expm([[phi^, rho], [0, 0]]) (scipy, f64)
    expected = np.array([
        [0.99500417, 0.09983342, 0.0, -1.04829251],
        [-0.09983342, 0.99500417, 0.0, -0.94837582],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(np.asarray(T_ts), expected, atol=1e-7)


def test_tran2vec_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=(20, 6))
    # rotation part inside the principal domain (0, pi)
    norms = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] = xi[:, 3:] / norms * (norms % 3.0)
    T = se3.vec2tran(jnp.array(xi))
    back = se3.tran2vec(T)
    np.testing.assert_allclose(np.asarray(back), xi, atol=1e-9)
    # identity -> zero
    np.testing.assert_allclose(
        np.asarray(se3.tran2vec(jnp.eye(4))), np.zeros(6), atol=1e-15)


def test_tran_inv():
    xi = jnp.array([0.4, -0.2, 0.9, 0.3, -0.1, 0.2])
    T = se3.vec2tran(xi)
    np.testing.assert_allclose(np.asarray(T @ se3.tran_inv(T)), np.eye(4), atol=1e-14)


def test_grads_finite():
    def f(phi):
        return jnp.sum(se3.exp_so3(phi))

    for phi in [jnp.zeros(3), jnp.array([1e-9, 0.0, 0.0]), jnp.array([0.3, -0.2, 0.9])]:
        g = jax.grad(f)(phi)
        assert np.all(np.isfinite(np.asarray(g)))


def test_jit_vmap():
    xi_np = np.random.default_rng(3).normal(size=(8, 6))
    norms = np.linalg.norm(xi_np[:, 3:], axis=-1, keepdims=True)
    xi_np[:, 3:] = xi_np[:, 3:] / norms * (norms % 3.0)
    xi = jnp.array(xi_np)
    T = jax.jit(jax.vmap(se3.vec2tran))(xi)
    back = jax.jit(jax.vmap(se3.tran2vec))(T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-9)


def test_float32_small_angles():
    """Regression: with the f64 small-angle threshold, float32 log/exp broke
    near identity — `1 - cos` underflowed to 0 (wrong left_jacobian) and
    `arccos` was evaluated at exactly 1.0 with a live tangent (NaN gradients
    through tran2vec of near-identity transforms)."""
    rng = np.random.default_rng(7)
    for scale in [0.0, 1e-8, 1e-4, 1e-2, 0.5]:
        xi = jnp.asarray(rng.normal(size=(32, 6)) * scale, jnp.float32)
        T = jax.vmap(se3.vec2tran)(xi)
        back = jax.vmap(se3.tran2vec)(T)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   atol=max(2e-7, 3e-7 * scale), rtol=0)

        g = jax.grad(lambda x: jnp.sum(jax.vmap(se3.tran2vec)(
            jax.vmap(se3.vec2tran)(x))))(xi)
        assert np.all(np.isfinite(np.asarray(g))), f"NaN grad at scale {scale}"

    # left_jacobian must not collapse to identity minus garbage in f32
    phi = jnp.asarray([[0.05, 0.0, 0.0]], jnp.float32)
    J = se3.left_jacobian(phi)[0]
    J64 = se3.left_jacobian(jnp.asarray(phi, jnp.float64))[0]
    np.testing.assert_allclose(np.asarray(J), np.asarray(J64), atol=1e-6)


def test_log_so3_small_angle_series_accuracy():
    """The small-branch series is an expansion in sin^2(theta): coefficient
    27/720 (3/80), not the theta^2-expansion's 7/720 — the wrong constant
    cost ~2 digits near the branch switch (code-review r3)."""
    for th in (0.02, 0.06, 0.0999):
        axis = np.array([0.36, -0.48, 0.8])
        phi = th * axis
        R = se3.exp_so3(jnp.asarray(phi))
        back = np.asarray(se3.log_so3(R))
        assert np.linalg.norm(back - phi) / th < 5e-8, (th, back)
