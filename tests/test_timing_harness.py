"""Smoke test for the truthful-timing harness (CPU: semantics only)."""

import jax.numpy as jnp

from benchmarks.timing import chained_rate


def test_chained_rate_positive_and_sane():
    def step(s):
        return jnp.sum(s * s) * 1e-9

    src = jnp.ones((64, 3))
    dt = chained_rate(step, src, k_small=2, k_big=6, reps=2)
    assert dt > 0
    assert dt < 1.0  # a trivial step cannot take a second


def test_chained_rate_consts_passed():
    def step(s, t):
        return jnp.sum(s @ t.T) * 1e-9

    src = jnp.ones((8, 3))
    tgt = jnp.ones((16, 3))
    dt = chained_rate(step, src, tgt, k_small=1, k_big=3, reps=1)
    assert dt > 0
