"""Streaming serving pipeline (dicp_tpu.pipeline) — windowed-dispatch
odometry must match the per-pair loop exactly (VERDICT r2 #3)."""

import jax.numpy as jnp
import numpy as np

from dicp_tpu import se3
from dicp_tpu.config import ICPConfig
from dicp_tpu.odometry import odometry
from dicp_tpu.pipeline import stream_odometry, stream_registrations

from tests.test_odometry import CFG, _make_sequence


def _as_stream(scans):
    """(S, n, c) array -> the (points, weight) numpy iterator the pipeline
    consumes (all-ones weights, the solver's default)."""
    for s in np.asarray(scans):
        yield s, np.ones((s.shape[0],), s.dtype)


def test_stream_matches_batched_odometry(target_np):
    """Windowed streaming == the one-shot batched odometry solve, exactly
    (same solver, batch==serial invariant) — incl. a ragged tail window."""
    scans, _ = _make_sequence(target_np, n_scans=8)
    ref = odometry(scans, CFG)
    for window in (3, 8, 16):    # 7 pairs: multi-window + tail, exact, pad
        # warm_start=False: the exactness contract is identity-init == the
        # batched odometry solve; the warm-start prior (default) reaches the
        # same fixed point in fewer iterations but not bitwise-identically.
        out = stream_odometry(_as_stream(scans), CFG, window=window,
                              warm_start=False)
        np.testing.assert_allclose(np.asarray(out.rel_transforms),
                                   np.asarray(ref.rel_transforms), atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.poses),
                                   np.asarray(ref.poses), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(out.converged),
                                      np.asarray(ref.converged))
        np.testing.assert_array_equal(np.asarray(out.iterations),
                                      np.asarray(ref.iterations))


def test_stream_registrations_window_boundaries(target_np):
    """Window seams reuse the boundary scan: pair (k*W) registers scan
    k*W+1 against scan k*W — no dropped or duplicated pairs."""
    scans, poses_true = _make_sequence(target_np, n_scans=6)
    chunks = list(stream_registrations(_as_stream(scans), CFG, window=2))
    ks = [c[0].shape[0] for c in chunks]
    assert sum(ks) == 5 and all(k <= 2 for k in ks)
    rel = jnp.concatenate([c[0] for c in chunks])
    # recovered relative transforms match ground truth steps
    for i in range(5):
        T_true = np.linalg.inv(np.asarray(poses_true[i])) @ np.asarray(poses_true[i + 1])
        err = np.linalg.norm(np.asarray(se3.tran2vec(
            jnp.asarray(np.asarray(rel[i]) @ np.linalg.inv(T_true)))))
        assert err < 1e-8


def test_stream_warm_start_same_fixed_point(target_np):
    """The constant-velocity warm start (default) reaches the same relative
    transforms as identity init — to solver tolerance, in no MORE total
    iterations — for per-pair (window=1) and windowed dispatch."""
    scans, poses_true = _make_sequence(target_np, n_scans=8)
    cold = stream_odometry(_as_stream(scans), CFG, window=4, warm_start=False)
    for window in (1, 4):
        warm = stream_odometry(_as_stream(scans), CFG, window=window,
                               warm_start=True)
        for i in range(7):
            err = np.linalg.norm(np.asarray(se3.tran2vec(jnp.asarray(
                np.asarray(warm.rel_transforms[i])
                @ np.linalg.inv(np.asarray(cold.rel_transforms[i]))))))
            assert err < 1e-6, (window, i, err)
        assert bool(np.all(np.asarray(warm.converged)))
        # the prior must not SLOW convergence (this sequence moves smoothly)
        assert (np.asarray(warm.iterations).sum()
                <= np.asarray(cold.iterations).sum()), (
            np.asarray(warm.iterations), np.asarray(cold.iterations))


def test_stream_needs_two_scans(target_np):
    scans, _ = _make_sequence(target_np, n_scans=2)
    one = list(stream_registrations(_as_stream(scans[:1]), CFG, window=4))
    assert one == []
    try:
        stream_odometry(_as_stream(scans[:1]), CFG)
    except ValueError as e:
        assert "two scans" in str(e)
    else:
        raise AssertionError("expected ValueError for a 1-scan stream")


def test_quantized_weightless_stream_matches(target_np):
    """uint16-quantized transfer + weight elision (the transfer-bound
    serving fix, dicp_tpu/pipeline.py): relative transforms must match the
    full-precision stream to well under the quantization noise floor, and
    omitting trivial all-ones weights must be exactly weightless."""
    scans, _ = _make_sequence(target_np, n_scans=8)
    # tolerance at the quantization noise floor: a 1e-10 delta-norm stop is
    # unreachable on ~1e-4-grid-quantized inputs (the solver oscillates at
    # the noise floor without formally converging)
    cfg = CFG.with_(tolerance=1e-6)
    full = stream_odometry(_as_stream(scans), cfg, window=4)

    def no_w():
        for s in np.asarray(scans):
            yield s, None

    quant = stream_odometry(no_w(), cfg, window=4, quantize=True)
    assert bool(np.all(np.asarray(quant.converged)))
    for i in range(7):
        err = np.linalg.norm(np.asarray(se3.tran2vec(jnp.asarray(
            np.asarray(quant.rel_transforms[i])
            @ np.linalg.inv(np.asarray(full.rel_transforms[i]))))))
        # quantization step = extent/65535 (~1e-4 here); the pose averages
        # it down over all points
        assert err < 1e-4, (i, err)


def test_stream_rejects_mixed_weights(target_np):
    scans, _ = _make_sequence(target_np, n_scans=4)
    arr = np.asarray(scans)

    def mixed():
        yield arr[0], np.ones((arr[0].shape[0],), arr[0].dtype)
        yield arr[1], None
        yield arr[2], None

    try:
        stream_odometry(mixed(), CFG, window=2)
    except ValueError as e:
        assert "weights" in str(e)
    else:
        raise AssertionError("expected ValueError for mixed weights")
