"""Unit tests for NN search, mirroring the reference suite (tests/test_nn.py)
plus gradient-semantics checks unique to the JAX design."""

import jax
import jax.numpy as jnp
import numpy as np

from dicp_tpu import knn
from dicp_tpu.nn import nn as nn_shim


POINTS = [(5.0, 4.0, 0.0), (2.0, 6.0, 0.0), (13.0, 3.0, 0.0), (8.0, 7.0, 0.0), (3.0, 1.0, 0.0)]


def test_hard_nn_exact_and_update():
    """Port of the reference NN test (tests/test_nn.py:12-41) on the hard path."""
    pts = jnp.array(POINTS, dtype=jnp.float32)
    q = jnp.array([[9.0, 4.0, 0.0]], dtype=jnp.float32)
    out = knn.find_nn(q, pts, differentiable=True, use_gumbel=False)
    np.testing.assert_array_equal(np.asarray(out)[0, 0], [8.0, 7.0, 0.0])

    pts2 = jnp.concatenate([pts, jnp.array([[10.0, 2.0, 0.0]], dtype=jnp.float32)])
    out2 = knn.find_nn(q, pts2, differentiable=True, use_gumbel=False)
    np.testing.assert_array_equal(np.asarray(out2)[0, 0], [10.0, 2.0, 0.0])


def test_gumbel_nn_matches_reference_class_default():
    """The reference class default (use_gumbel=True, dICP/nn.py:5) still
    returns the exact neighbor at tau=0.1 because the softmax is numerically
    one-hot; gradients reach BOTH query and targets (tests/test_nn.py:28-33)."""
    searcher = nn_shim(differentiable=True)  # use_gumbel=True default
    pts = jnp.array(POINTS, dtype=jnp.float32)
    q = jnp.array([[9.0, 4.0, 0.0]], dtype=jnp.float32)
    out = searcher.find_nn(q, pts, key=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out)[0, 0], [8.0, 7.0, 0.0])

    def f(q_, pts_):
        return jnp.sum(knn.gumbel_nn(q_[None], pts_[None], jax.random.key(0), tau=0.1))

    gq, gp = jax.grad(f, argnums=(0, 1))(q[0], pts)
    assert np.all(np.isfinite(np.asarray(gq))) and np.all(np.isfinite(np.asarray(gp)))


def test_hard_nn_gradient_semantics():
    """Hard path: grad reaches gathered target rows only; query grad through
    the selection is zero (argmin index detached, dICP/nn.py:35-38)."""
    pts = jnp.array(POINTS, dtype=jnp.float64)
    q = jnp.array([[9.0, 4.0, 0.0]], dtype=jnp.float64)

    gq = jax.grad(lambda q_: jnp.sum(knn.hard_nn(q_[None], pts[None])))(q)
    np.testing.assert_array_equal(np.asarray(gq), 0.0)

    gp = jax.grad(lambda p_: jnp.sum(knn.hard_nn(q[None], p_[None])))(pts)
    expected = np.zeros((5, 3))
    expected[3] = 1.0  # only the selected row gets gradient
    np.testing.assert_array_equal(np.asarray(gp), expected)


def test_normals_ride_along():
    pts6 = jnp.concatenate(
        [jnp.array(POINTS), jnp.arange(15.0).reshape(5, 3)], axis=-1)
    q = jnp.array([[9.0, 4.0, 0.0]])
    out = knn.find_nn(q, pts6, differentiable=False)
    assert out.shape == (1, 1, 6)
    np.testing.assert_array_equal(np.asarray(out)[0, 0, 3:], [9.0, 10.0, 11.0])


def test_dimension_handling_transposed():
    """(3, n)/(6, m) inputs are transposed like dICP/nn.py:94-125."""
    pts = jnp.array(POINTS)
    q = jnp.array([[9.0, 4.0, 0.0], [2.5, 5.5, 0.0]])
    a = knn.find_nn(q, pts, differentiable=False)
    b = knn.find_nn(q.T, pts.T, differentiable=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(4, 10, 3)))
    y = jnp.array(rng.normal(size=(4, 20, 3)))
    out = knn.find_nn(x, y, differentiable=False)
    # compare against per-batch loop
    for i in range(4):
        ref = knn.find_nn(x[i], y[i], differentiable=False)
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(ref[0]))


def test_matches_exact_bruteforce():
    """Matmul-form distances pick the same argmin as exact broadcast form."""
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 50, 3)) * 10)
    y = jnp.array(rng.normal(size=(2, 80, 3)) * 10)
    idx = knn.nn_indices(x, y)
    d2_exact = jnp.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)
    idx_exact = jnp.argmin(d2_exact, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_exact))


def test_gumbel_streaming_matches_hard_nn_when_separated():
    """The chunked online-softmax Gumbel path (no (n, m) materialization)
    must agree with the dense path in the well-separated regime where the
    softmax is numerically one-hot regardless of the noise draw."""
    from dicp_tpu import knn

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 3)))
    # targets on a coarse lattice: nearest-vs-next-nearest d^2 gap >> tau*noise
    y = jnp.asarray(np.concatenate(
        [rng.normal(size=(100, 3)) * 0.01 + rng.integers(-5, 5, size=(100, 3)) * 30.0,
         rng.normal(size=(100, 3))], axis=1).reshape(100, 6)[:, :3])
    y = jnp.concatenate([y, jnp.asarray(rng.normal(size=(100, 3)))], axis=-1)
    key = jax.random.PRNGKey(0)
    hard = knn.hard_nn(x, y)
    dense = knn.gumbel_nn(x, y, key, tau=1e-3)
    stream = knn.gumbel_nn(x, y, key, tau=1e-3, chunk=32)  # 4 chunksversus dense
    np.testing.assert_allclose(np.asarray(dense), np.asarray(hard), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(hard), atol=1e-6)

    # gradients flow through the streaming path into query and targets
    # (soft regime: nearby targets so the softmax is genuinely mixed)
    xs = jnp.asarray(rng.normal(size=(40, 3)))
    ys = jnp.asarray(rng.normal(size=(100, 6)))

    def loss(x_, y_):
        return jnp.sum(knn.gumbel_nn(x_, y_, key, tau=0.5, chunk=32) ** 2)

    gx, gy = jax.grad(loss, argnums=(0, 1))(xs, ys)
    assert np.all(np.isfinite(np.asarray(gx))) and np.any(np.asarray(gx) != 0)
    assert np.all(np.isfinite(np.asarray(gy))) and np.any(np.asarray(gy) != 0)

    # batched inputs + non-divisible chunking (padding masked correctly)
    xb = jnp.asarray(rng.normal(size=(2, 7, 3)))
    yb = jnp.asarray(rng.normal(size=(2, 33, 6)))
    outb = knn.gumbel_nn(xb, yb, key, tau=0.5, chunk=8)
    assert outb.shape == (2, 7, 6)
    assert np.all(np.isfinite(np.asarray(outb)))
    # convexity: streamed soft neighbor stays inside the target bounding box
    lo = np.asarray(jnp.min(yb, axis=-2, keepdims=True))
    hi = np.asarray(jnp.max(yb, axis=-2, keepdims=True))
    o = np.asarray(outb)
    assert np.all(o >= lo - 1e-9) and np.all(o <= hi + 1e-9)
