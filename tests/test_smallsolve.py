"""Closed-form SPD solves vs LU ground truth, values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu.ops.smallsolve import inv3, solve3, solve6_spd, solve_spd


def _spd(rng, batch, k, scale=1.0):
    m = rng.normal(size=(batch, k, k)).astype(np.float64)
    a = m @ np.swapaxes(m, -1, -2) + 0.1 * np.eye(k)
    return jnp.asarray(a * scale)


@pytest.mark.parametrize("k", [3, 6])
def test_solve_matches_lu_f64(k):
    rng = np.random.default_rng(0)
    a = _spd(rng, 64, k)
    b = jnp.asarray(rng.normal(size=(64, k)))
    x = solve_spd(a, b)
    x_ref = jnp.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-10, atol=1e-12)


def test_inv3_matches():
    rng = np.random.default_rng(1)
    a = _spd(rng, 32, 3)
    np.testing.assert_allclose(np.asarray(inv3(a)), np.linalg.inv(np.asarray(a)),
                               rtol=1e-10, atol=1e-12)


def test_solver_like_conditioning_f32():
    """Systems shaped like the solver's normal equations: J^T W J + 1e-6 I
    with point coordinates up to ~25 (the tests/data scale)."""
    rng = np.random.default_rng(2)
    pts = rng.uniform(-25, 25, size=(256, 65, 3)).astype(np.float32)
    nrm = rng.normal(size=(256, 65, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    J = np.concatenate([np.cross(nrm, pts), -nrm], axis=-1).astype(np.float32)
    a = jnp.asarray(np.einsum("npi,npj->nij", J, J) + 1e-6 * np.eye(6, dtype=np.float32))
    b = jnp.asarray(rng.normal(size=(256, 6)).astype(np.float32))
    x = solve6_spd(a, b)
    x_ref = np.linalg.solve(np.asarray(a, np.float64),
                            np.asarray(b, np.float64)[..., None])[..., 0]
    err = np.linalg.norm(np.asarray(x) - x_ref, axis=-1) / np.linalg.norm(x_ref, axis=-1)
    assert np.max(err) < 1e-3, f"max relative error {np.max(err)}"


def test_gradients_flow_and_match():
    rng = np.random.default_rng(3)
    a = _spd(rng, 8, 3)
    b = jnp.asarray(rng.normal(size=(8, 3)))

    g_closed = jax.grad(lambda a_: jnp.sum(solve3(a_, b)))(a)
    g_lu = jax.grad(lambda a_: jnp.sum(jnp.linalg.solve(a_, b[..., None])))(a)
    np.testing.assert_allclose(np.asarray(g_closed), np.asarray(g_lu),
                               rtol=1e-8, atol=1e-10)


def test_solver_end_to_end_closed_vs_lu(test_pair):
    """Full registration: closed-form and LU solves converge to the same T."""
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    scan, mp = test_pair
    src = jnp.asarray(scan[None, :, :3])
    tgt = jnp.asarray(mp[None])
    ti = jnp.eye(4, dtype=src.dtype)[None]
    base = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=50,
                     tolerance=1e-10, dim=2, trim_dist=5.0,
                     loss_name="huber", loss_metric=1.0)
    t_closed = register_jit(src, tgt, ti, None, cfg=base.with_(solve_method="closed")).T
    t_lu = register_jit(src, tgt, ti, None, cfg=base.with_(solve_method="lu")).T
    np.testing.assert_allclose(np.asarray(t_closed), np.asarray(t_lu), atol=1e-7)


def test_scale_disparate_blocks_f32():
    """Regression: real scan-pair normal equations have a rotation block
    scaling with (point radius)^2 * n and a translation block with n — a
    ~1e4 scale disparity that made the unequilibrated f32 Schur complement
    cancel to det=0 -> NaN (LU survived the same systems)."""
    rng = np.random.default_rng(5)
    n = 8192
    pts = rng.uniform(-28, 28, size=(n, 3)).astype(np.float32)
    nrm = np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=n)]
    J = np.concatenate([np.cross(nrm, pts), -nrm], axis=-1).astype(np.float32)
    a = jnp.asarray((np.einsum("pi,pj->ij", J, J) + 1e-6 * np.eye(6))[None]
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32) * n)
    x = solve_spd(a, b)
    assert np.all(np.isfinite(np.asarray(x))), "closed-form solve NaN'd"
    x_ref = np.linalg.solve(np.asarray(a, np.float64),
                            np.asarray(b, np.float64)[..., None])[..., 0]
    rel = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, f"relative error {rel}"
