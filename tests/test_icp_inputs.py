"""Input-handling parity tests: port of the reference suite
(tests/test_ICP_inputs.py).  The batch == serial invariant is the core
numerical contract (tests/test_ICP_inputs.py:96-110)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.api import ICP

MAX_ITER = 25
TOL = 1e-8


def _err_norm(T_a, T_b):
    e = se3.tran2vec(jnp.asarray(T_a) @ jnp.linalg.inv(jnp.asarray(T_b)))
    return float(jnp.linalg.norm(np.asarray(e)))


def test_input_types(source_np, target_np):
    """Ragged list-of-arrays batch must equal per-cloud serial results,
    including matched-ratio stats (tests/test_ICP_inputs.py:36-110)."""
    rng = np.random.default_rng(42)  # reference uses unseeded np.random (l.52)
    source_1 = np.vstack([source_np[:50, :3], rng.random((1, 3)) * 1000])  # outlier
    target_1 = target_np[:55]
    source_2 = source_np[:, :3]
    target_2 = target_np
    source_3 = source_np[:55, :3]
    target_3 = target_np[:60]

    sources = [jnp.asarray(s) for s in (source_1, source_2, source_3)]
    targets = [jnp.asarray(t) for t in (target_1, target_2, target_3)]
    T_init = jnp.eye(4, dtype=jnp.float64)
    loss_fn = {"name": "huber", "metric": 1.0}

    solver = ICP(icp_type="pt2pl", differentiable=True,
                 max_iterations=MAX_ITER, tolerance=TOL)

    T_serial, ratio_serial = [], []
    for s, t in zip(sources, targets):
        res = solver.icp(s, t, T_init, trim_dist=5.0, loss_fn=loss_fn, dim=2)
        T_serial.append(np.asarray(res["T"][0]))
        ratio_serial.append(float(res["stats"]["matched_ratio"][0]))

    res_b = solver.icp(sources, targets, jnp.stack([T_init] * 3),
                       trim_dist=5.0, loss_fn=loss_fn, dim=2)
    T_batch = np.asarray(res_b["T"])
    ratio_batch = np.asarray(res_b["stats"]["matched_ratio"])

    err = se3.tran2vec(jnp.asarray(np.stack(T_serial)) @ jnp.linalg.inv(jnp.asarray(T_batch)))
    assert float(jnp.linalg.norm(err)) < TOL
    assert np.linalg.norm(np.asarray(ratio_serial) - ratio_batch) < TOL


def test_zero_inputs(source_np, target_np):
    """Empty source/target/both return T_init (tests/test_ICP_inputs.py:113-155)."""
    source_1 = jnp.asarray(source_np)
    target_2 = jnp.asarray(target_np)
    sources = [source_1, [], []]
    targets = [[], target_2, []]

    T_init = jnp.eye(4, dtype=jnp.float64)
    T_stack = jnp.stack([T_init] * 3)
    solver = ICP(icp_type="pt2pl", differentiable=True,
                 max_iterations=MAX_ITER, tolerance=TOL)

    for s, t in zip(sources, targets):
        res = solver.icp(s, t, T_init, trim_dist=5.0, loss_fn=None, dim=2)
        assert np.linalg.norm(np.asarray(res["T"][0]) - np.eye(4)) < TOL

    res_b = solver.icp(sources, targets, T_stack, trim_dist=5.0, loss_fn=None, dim=2)
    assert np.linalg.norm(np.asarray(res_b["T"]) - np.asarray(T_stack)) < TOL


def test_weight_inputs(source_np, target_np):
    """weight=None == ones; zero-weighted junk points change nothing; list
    weights batch == serial (tests/test_ICP_inputs.py:157-211)."""
    rng = np.random.default_rng(7)
    source_1 = source_np[:, :3]
    weight_1 = None
    source_2 = source_np[:, :3]
    weight_2 = jnp.ones(source_2.shape[0], dtype=jnp.float64)
    source_3 = np.vstack([source_np[:, :3], rng.random((10, 3))])
    weight_3 = jnp.asarray(np.hstack([np.ones(source_np.shape[0]), np.zeros(10)]))

    sources = [jnp.asarray(source_1), jnp.asarray(source_2), jnp.asarray(source_3)]
    targets = [jnp.asarray(target_np)] * 3
    weights = [weight_1, weight_2, weight_3]

    T_init = jnp.eye(4, dtype=jnp.float64)
    loss_fn = {"name": "huber", "metric": 1.0}
    solver = ICP(icp_type="pt2pl", differentiable=True,
                 max_iterations=MAX_ITER, tolerance=TOL)

    T_serial = []
    for s, t, w in zip(sources, targets, weights):
        res = solver.icp(s, t, T_init, weight=w, trim_dist=5.0, loss_fn=loss_fn, dim=2)
        T_serial.append(np.asarray(res["T"][0]))

    res_b = solver.icp(sources, targets, jnp.stack([T_init] * 3), weight=weights,
                       trim_dist=5.0, loss_fn=loss_fn, dim=2)
    assert np.linalg.norm(np.asarray(res_b["T"]) - np.stack(T_serial)) < TOL
    # All three solutions identical: junk points have zero weight.
    assert np.linalg.norm(T_serial[0] - T_serial[1]) < TOL
    assert np.linalg.norm(T_serial[0] - T_serial[2]) < TOL


def test_diff_vs_nondiff_types(source_np, target_np):
    """diff and non-diff converge to the same T on an easy, well-initialized
    problem (tests/test_ICP_inputs.py:213-252)."""
    source = jnp.asarray(source_np[:50, :3])
    target = jnp.asarray(target_np[:55])
    T_init = jnp.eye(4, dtype=jnp.float64)

    for loss_fn in ({"name": "huber", "metric": 1.0}, {"name": "cauchy", "metric": 0.5}):
        s_diff = ICP(icp_type="pt2pl", differentiable=True,
                     max_iterations=MAX_ITER, tolerance=TOL)
        s_nond = ICP(icp_type="pt2pl", differentiable=False,
                     max_iterations=MAX_ITER, tolerance=TOL)
        T_diff = s_diff.icp(source, target, T_init, trim_dist=5.0, loss_fn=loss_fn, dim=2)["T"][0]
        T_nond = s_nond.icp(source, target, T_init, trim_dist=5.0, loss_fn=loss_fn, dim=2)["T"][0]
        assert _err_norm(np.asarray(T_diff), np.asarray(T_nond)) < TOL


def test_padded_inputs(source_np, target_np):
    """source_zeroes_are_pad: zero-padded source == unpadded
    (tests/test_ICP_inputs.py:254-271; attribute poke at :263)."""
    source = jnp.asarray(source_np[:50, :3])
    target = jnp.asarray(target_np[:55])
    T_init = jnp.eye(4, dtype=jnp.float64)
    source_pad = jnp.concatenate([source, jnp.zeros((20, 3), dtype=source.dtype)])

    solver = ICP(icp_type="pt2pt", differentiable=False,
                 max_iterations=MAX_ITER, tolerance=TOL)
    solver.source_zeroes_are_pad = True

    T_a = solver.icp(source, target, T_init, dim=2)["T"][0]
    T_b = solver.icp(source_pad, target, T_init, dim=2)["T"][0]
    assert _err_norm(np.asarray(T_a), np.asarray(T_b)) < TOL


def test_const_iter(source_np, target_np):
    """const_iter forces exactly max_iterations (config key, dICP/ICP.py:240)."""
    source = jnp.asarray(source_np[:, :3])
    target = jnp.asarray(target_np)
    solver = ICP(icp_type="pt2pl", differentiable=True,
                 max_iterations=12, tolerance=TOL)
    solver.const_iter = True
    res = solver.icp(source, target, jnp.eye(4, dtype=source.dtype),
                     trim_dist=5.0, loss_fn={"name": "huber", "metric": 1.0}, dim=2)
    assert res["deltas"].shape[1] == 12
    assert float(res["stats"]["iterations"][0]) == 12.0


def test_3d_dim(source_np, target_np):
    """dim=3 path solves the full 6-dof problem (the data is planar, so the
    recovered transform should still match in-plane and be finite)."""
    source = jnp.asarray(source_np[:, :3])
    target = jnp.asarray(target_np)
    solver = ICP(icp_type="pt2pl", differentiable=True,
                 max_iterations=50, tolerance=1e-10)
    res = solver.icp(source, target, jnp.eye(4, dtype=source.dtype),
                     trim_dist=5.0, loss_fn={"name": "huber", "metric": 1.0}, dim=3)
    T = np.asarray(res["T"][0])
    assert np.all(np.isfinite(T))
    # planar data: z-translation should remain ~0 and in-plane parts recover truth
    xi = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 0.1], dtype=jnp.float64)
    T_true = np.asarray(se3.tran_inv(se3.vec2tran(xi)))
    np.testing.assert_allclose(T[:2, 3], T_true[:2, 3], atol=1e-3)


def test_mixed_list_dense_inputs(source_np, target_np):
    """Ragged list source + one shared dense target (and the converse) —
    the reference handles the two containers independently
    (dICP/ICP.py:361-426 vs :440-485)."""
    solver = ICP(icp_type="pt2pl", differentiable=False,
                 max_iterations=25, tolerance=1e-8)
    kw = dict(trim_dist=5.0, loss_fn={"name": "huber", "metric": 1.0}, dim=2)

    sources = [jnp.asarray(source_np[:51, :3]), jnp.asarray(source_np[:, :3])]
    res = solver.icp(sources, jnp.asarray(target_np), jnp.eye(4), **kw)
    assert res["T"].shape == (2, 4, 4)
    assert np.all(np.isfinite(np.asarray(res["T"])))

    targets = [jnp.asarray(target_np[:55]), jnp.asarray(target_np)]
    res2 = solver.icp(jnp.asarray(source_np[:, :3]), targets, jnp.eye(4), **kw)
    assert res2["T"].shape == (2, 4, 4)
    assert np.all(np.isfinite(np.asarray(res2["T"])))


def test_phony_path_batched_t_init():
    """Empty clouds with a BATCHED T_init must return it unchanged
    (the reference returns identity; we preserve the passed inits)."""
    from dicp_tpu import se3

    solver = ICP(icp_type="pt2pl", max_iterations=10, tolerance=1e-8)
    t1 = np.asarray(se3.vec2tran(jnp.asarray([0.1, 0.2, 0, 0, 0, 0.3])))
    ti = jnp.asarray(np.stack([np.eye(4), t1]).astype(np.float32))
    res = solver.icp([], [], ti, dim=2)
    np.testing.assert_allclose(np.asarray(res["T"]), np.asarray(ti), atol=1e-6)


def test_negative_coordinate_padding(source_np, target_np):
    """Ragged batch with all-NEGATIVE coordinates: the reference's
    max(source)*1000 sentinel lands at the origin and pad rows can win the
    NN search; ours must not."""
    from dicp_tpu import se3

    shift = np.array([-60.0, -60.0, 0.0])
    src_n = source_np[:, :3] + shift
    tgt_n = np.hstack([target_np[:, :3] + shift, target_np[:, 3:6]])
    solver = ICP(icp_type="pt2pl", differentiable=False,
                 max_iterations=50, tolerance=1e-10)
    res = solver.icp([jnp.asarray(src_n[:51]), jnp.asarray(src_n)],
                     [jnp.asarray(tgt_n[:55]), jnp.asarray(tgt_n)],
                     jnp.eye(4), trim_dist=5.0,
                     loss_fn={"name": "huber", "metric": 1.0}, dim=2)
    # the full pair (element 1) must still recover the (shift-conjugated)
    # reference transform: both clouds moved by s, so T' = Tr(s) T Tr(-s)
    t_true = se3.tran_inv(se3.vec2tran(jnp.asarray([1.0, 1.0, 0, 0, 0, 0.1])))
    tr = jnp.eye(4).at[:3, 3].set(jnp.asarray(shift))
    t_true = tr @ t_true @ se3.tran_inv(tr)
    err = float(jnp.linalg.norm(se3.tran2vec(
        se3.compose(t_true, se3.tran_inv(res["T"][1])))))
    assert err < 1e-6, f"padding corrupted the solve: err {err}"


def test_batch_length_mismatch_raises(source_np, target_np):
    """Mismatched batch lengths must fail with a clear ValueError up front,
    not an opaque shape error deep in the solver."""
    import pytest

    from dicp_tpu.api import batch_size_handling

    src_dense = jnp.asarray(np.stack([source_np[:, :3]] * 3))  # (3, n, 3)
    tgt_list = [jnp.asarray(target_np), jnp.asarray(target_np)]  # 2 clouds
    with pytest.raises(ValueError, match="batch length"):
        batch_size_handling(src_dense, tgt_list)
    with pytest.raises(ValueError, match="batch length"):
        batch_size_handling([jnp.asarray(source_np[:, :3])] * 3, tgt_list)
    # short weight list
    with pytest.raises(ValueError, match="weight"):
        batch_size_handling([jnp.asarray(source_np[:, :3])] * 2,
                            tgt_list, weight=[jnp.ones(65)])
    # dense weight with wrong row count
    with pytest.raises(ValueError, match="rows"):
        batch_size_handling(src_dense, jnp.asarray(np.stack([target_np] * 3)),
                            weight=jnp.ones((2, 65)))


def test_gumbel_chunked_matches_unchunked(source_np, target_np):
    """Per-GLOBAL-batch-element PRNG streams (ADVICE r2): Gumbel-NN solves
    must be bitwise-identical whether the batch runs whole or in
    ``batch_chunk`` pieces, and element i's result must not depend on the
    other elements in the batch."""
    import jax

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register

    src = jnp.asarray(np.stack([source_np[:, :3]] * 4))
    tgt = jnp.asarray(np.stack([target_np] * 4))
    ti = jnp.broadcast_to(jnp.eye(4, dtype=src.dtype), (4, 4, 4))
    key = jax.random.key(7)
    cfg = ICPConfig(icp_type="pt2pl", max_iterations=5, tolerance=1e-10,
                    differentiable=True, use_gumbel=True, dim=2,
                    const_iter=True)
    full = register(src, tgt, ti, cfg=cfg, key=key)
    chunked = register(src, tgt, ti, cfg=cfg.with_(batch_chunk=2), key=key)
    # identical noise STREAMS; XLA may still fuse reductions differently
    # between the chunked and whole-batch programs (f64-epsilon differences)
    np.testing.assert_allclose(np.asarray(full.T), np.asarray(chunked.T),
                               atol=1e-12)

    # batch-composition invariance: element 2 of a 4-batch == element 0 of
    # the 2-batch starting at global index 2 is NOT required (keys are per
    # GLOBAL index), but a batch of the first 2 elements must reproduce the
    # first 2 rows of the 4-batch exactly
    first2 = register(src[:2], tgt[:2], ti[:2], cfg=cfg, key=key)
    np.testing.assert_allclose(np.asarray(full.T[:2]), np.asarray(first2.T),
                               atol=1e-12)


def test_negative_trim_dist_matches_reference(source_np, target_np):
    """Reference semantics for trim_dist < 0 (dICP/loss.py:58): the hard
    gate ||e|| < k zeroes every weight, so the solve is a no-op and T_init
    comes back unchanged (previously treated as no-trim — VERDICT r2 #9)."""
    from dicp_tpu.api import ICP

    solver = ICP(icp_type="pt2pl", max_iterations=20, tolerance=1e-10,
                 differentiable=False)
    ti = jnp.eye(4, dtype=jnp.float64)
    out = solver.icp(source_np[:, :3], target_np, ti, trim_dist=-1.0, dim=2)
    np.testing.assert_allclose(np.asarray(out["T"][0]), np.asarray(ti),
                               atol=1e-12)

    # differentiable mode: the reference's soft gate formula applies
    # unchanged at negative k (0.5*tanh(s*(k-|e|)-3)+0.5, dICP/loss.py:54) —
    # tiny positive weights, and Gauss-Newton is scale-invariant, so the
    # solve PROCEEDS (unlike the hard gate).  Pin the formula itself.
    from dicp_tpu import losses

    e = jnp.asarray(np.array([[[0.5, 0.0, 0.0], [2.0, 0.0, 0.0]]]))
    w = losses.trim_weight(e, -1.0, differentiable=True, tanh_steepness=5.0)
    expect = 0.5 * np.tanh(5.0 * (-1.0 - np.array([0.5, 2.0])) - 3.0) + 0.5
    np.testing.assert_allclose(np.asarray(w[0]), expect, rtol=1e-6,
                               atol=1e-15)  # saturated tanh: ~eps-level floor


def test_icp_nn_attribute_parity():
    """The reference constructor exposes ``self.nn`` (dICP/ICP.py:44);
    user code pokes ``icp.nn.tau`` and calls ``icp.nn.find_nn``."""
    from dicp_tpu.api import ICP

    solver = ICP(icp_type="pt2pl")
    assert hasattr(solver, "nn")
    assert solver.nn.tau == solver.gumbel_tau
    y = jnp.asarray(np.array([[0.0, 0, 0, 0, 0, 1.0], [5.0, 0, 0, 0, 0, 1.0]]))
    x = jnp.asarray(np.array([[0.1, 0.0, 0.0]]))
    solver.nn.use_gumbel = False
    out = solver.nn.find_nn(x, y)
    np.testing.assert_allclose(np.asarray(out[0, 0, :3]), [0.0, 0, 0],
                               atol=1e-12)


def test_ragged_target_pad_stays_in_bbox_and_cluster_safe():
    """Ragged-target pad rows must not distort geometry-sensitive backends:
    the reference's (max|src|+1)*1000 sentinel collapses the cluster
    index's Hilbert bounding box to 1-2 cells (code-review r3).  Hard-NN
    padding now repeats the last real row (tie rules make pads unelectable
    winners), so a padded ragged batch solved through the CLUSTER backend
    matches the unpadded per-cloud dense solve."""
    from dicp_tpu.api import batch_size_handling
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    rng = np.random.default_rng(5)
    base = rng.uniform(-5, 5, (4000, 3))
    xi = jnp.asarray(np.array([0.05, -0.03, 0.02, 0.01, 0.0, 0.02]))
    T = se3.vec2tran(xi)
    src_np = (base @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3])
    tgt_list = [jnp.asarray(base), jnp.asarray(base[:2500])]   # ragged
    src_list = [jnp.asarray(src_np), jnp.asarray(src_np[:2500])]

    src, tgt, ti, w = batch_size_handling(src_list, tgt_list)
    # pads stay inside the real cloud's bounding box
    assert float(jnp.max(jnp.abs(tgt))) <= float(np.abs(base).max()) + 1e-6

    cfg = ICPConfig(icp_type="pt2pt", differentiable=False,
                    max_iterations=30, tolerance=1e-10, dim=3,
                    trim_dist=2.0, loss_name="huber", loss_metric=1.0,
                    nn_method="cluster")
    res_b = register_jit(src, tgt, jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
                         w, cfg=cfg)
    cfg_d = cfg.with_(nn_method="dense")
    for i, (s, t) in enumerate(zip(src_list, tgt_list)):
        ref = register_jit(s[None], t[None], jnp.eye(4)[None], None,
                           cfg=cfg_d)
        np.testing.assert_allclose(np.asarray(res_b.T[i]),
                                   np.asarray(ref.T[0]), atol=1e-8)


def test_soft_nn_pad_keeps_sentinel():
    """Gumbel mode keeps the far sentinel: duplicated pad rows would get
    softmax probability mass and shift the convex-combination neighbor."""
    from dicp_tpu.api import batch_size_handling

    rng = np.random.default_rng(6)
    tgt_list = [jnp.asarray(rng.uniform(-1, 1, (50, 3))),
                jnp.asarray(rng.uniform(-1, 1, (30, 3)))]
    src_list = [jnp.asarray(rng.uniform(-1, 1, (40, 3)))] * 2
    _, tgt, _, _ = batch_size_handling(src_list, tgt_list, soft_nn=True)
    assert float(jnp.max(jnp.abs(tgt[1, 30:]))) > 100.0


def test_icp_nn_poke_changes_solve(test_pair):
    """Reference idiom: mutating ``icp.nn.tau``/``icp.nn.use_gumbel`` must
    change the next solve — the reference loop reads self.nn live
    (dICP/ICP.py:44); code-review r3 found the poke was silently ignored."""
    source_np, target_np = test_pair
    key = jax.random.PRNGKey(0)
    mk = lambda: ICP(icp_type="pt2pl", differentiable=True,
                     max_iterations=5, tolerance=1e-10, use_gumbel=True)
    s1, s2 = mk(), mk()
    s2.nn.tau = 25.0          # hot softmax: neighbors become blends
    args = dict(trim_dist=5.0, loss_fn={"name": "huber", "metric": 1.0},
                dim=2, key=key)
    r1 = s1.icp(jnp.asarray(source_np[:, :3]), jnp.asarray(target_np),
                jnp.eye(4), **args)
    r2 = s2.icp(jnp.asarray(source_np[:, :3]), jnp.asarray(target_np),
                jnp.eye(4), **args)
    assert float(jnp.max(jnp.abs(r1["T"] - r2["T"]))) > 1e-6
