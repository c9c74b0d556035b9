"""Unit tests for robust IRLS weights (reference semantics: dICP/loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dicp_tpu import losses
from dicp_tpu.loss import loss as loss_shim


def _errs():
    rng = np.random.default_rng(0)
    return jnp.array(rng.normal(size=(4, 7, 3)) * 3.0)


def test_huber_diff_is_pseudo_huber():
    err = _errs()
    k = 1.5
    w = losses.huber_weight(err, k, differentiable=True)
    n = np.linalg.norm(np.asarray(err), axis=-1)
    np.testing.assert_allclose(np.asarray(w), k**2 / (k**2 + n**2), rtol=1e-12)


def test_huber_nondiff_classic():
    err = _errs()
    k = 1.5
    w = np.asarray(losses.huber_weight(err, k, differentiable=False))
    n = np.linalg.norm(np.asarray(err), axis=-1)
    expected = np.where(n > k, k / n, 1.0)
    np.testing.assert_allclose(w, expected, rtol=1e-12)


def test_cauchy():
    err = _errs()
    k = 0.5
    w = np.asarray(losses.cauchy_weight(err, k))
    n = np.linalg.norm(np.asarray(err), axis=-1)
    np.testing.assert_allclose(w, 1.0 / (1.0 + (n / k) ** 2), rtol=1e-12)


def test_trim_soft_and_hard():
    err = _errs()
    k, s = 5.0, 5.0
    n = np.linalg.norm(np.asarray(err), axis=-1)
    w_soft = np.asarray(losses.trim_weight(err, k, differentiable=True, tanh_steepness=s))
    np.testing.assert_allclose(w_soft, 0.5 * np.tanh(s * (k - n) - 3.0) + 0.5,
                               rtol=1e-12, atol=1e-15)
    w_hard = np.asarray(losses.trim_weight(err, k, differentiable=False))
    np.testing.assert_allclose(w_hard, (n < k).astype(float))


def test_2d_input_reduces_last_axis():
    # The reference reduces axis 1 for 2-D input (dICP/loss.py:25) = last axis.
    err2 = jnp.array([[3.0, 4.0], [0.0, 0.5]])
    w = np.asarray(losses.huber_weight(err2, 1.0, differentiable=False))
    np.testing.assert_allclose(w, [1.0 / 5.0, 1.0])


def test_class_shim_dispatch():
    err = _errs()
    for name, metric in [("huber", 1.0), ("cauchy", 0.5), ("trim", 5.0)]:
        shim = loss_shim(name=name, metric=metric, differentiable=True, tanh_steepness=5.0)
        direct = losses.robust_weight(name, err, metric, True, 5.0)
        np.testing.assert_allclose(np.asarray(shim.get_weight(err)), np.asarray(direct))


def test_invalid_name_raises():
    import pytest
    with pytest.raises(ValueError):
        losses.robust_weight("nope", _errs(), 1.0)


def test_weights_differentiable():
    err = _errs()

    for fn in [
        lambda e: jnp.sum(losses.huber_weight(e, 1.0, True)),
        lambda e: jnp.sum(losses.cauchy_weight(e, 0.5)),
        lambda e: jnp.sum(losses.trim_weight(e, 5.0, True, 5.0)),
    ]:
        g = jax.grad(fn)(err)
        assert np.all(np.isfinite(np.asarray(g)))


def test_welsch_weight():
    from dicp_tpu.losses import welsch_weight

    err = jnp.array([[0.0, 0.0], [1.0, 0.0], [3.0, 4.0]])
    w = welsch_weight(err, 2.0)
    np.testing.assert_allclose(np.asarray(w),
                               [1.0, np.exp(-0.25), np.exp(-25.0 / 4.0)],
                               rtol=1e-6)
    g = jax.grad(lambda e: jnp.sum(welsch_weight(e, 2.0)))(err)
    assert np.all(np.isfinite(np.asarray(g)))


def test_gm_weight():
    from dicp_tpu.losses import gm_weight

    err = jnp.array([[0.0], [2.0]])
    w = gm_weight(err, 2.0)
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.25], rtol=1e-6)
    g = jax.grad(lambda e: jnp.sum(gm_weight(e, 2.0)))(err)
    assert np.all(np.isfinite(np.asarray(g)))


def test_redescending_losses_solve(source_np, target_np):
    """welsch/gm kernels drive the full solver to the reference transform."""
    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    t_true = se3.tran_inv(se3.vec2tran(jnp.array([1.0, 1.0, 0, 0, 0, 0.1])))
    for name in ("welsch", "gm"):
        cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                        tolerance=1e-12, dim=2, trim_dist=5.0,
                        loss_name=name, loss_metric=10.0)
        res = register_jit(jnp.asarray(source_np[None, :, :3]),
                           jnp.asarray(target_np[None]),
                           jnp.eye(4, dtype=jnp.float64)[None], None, cfg=cfg)
        err = float(jnp.linalg.norm(se3.tran2vec(
            se3.compose(t_true, se3.tran_inv(res.T[0])))))
        assert err < 1e-9, f"{name}: err {err}"


def test_huber_nondiff_grad_at_zero_residual():
    """grad of the non-diff huber weight at EXACT-zero residuals must be
    finite: the jnp.where trap (0 * inf = NaN via metric/err_norm at 0)
    poisoned gradients on converged correspondences (code-review r3)."""
    err = jnp.zeros((4, 3))
    g = jax.grad(lambda e: jnp.sum(
        losses.huber_weight(e, 1.0, differentiable=False)))(err)
    assert np.all(np.isfinite(np.asarray(g)))
