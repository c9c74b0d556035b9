"""Scan-to-map odometry: register each scan against a persistent local map.

No reference counterpart (the reference is a single-pair solver,
SURVEY.md §1); this is the standard LiDAR-odometry accuracy upgrade over
scan-to-scan chaining: registering against an *accumulated* map anchors
every scan to geometry posed many frames ago, so per-pair errors stop
compounding into drift.

TPU-first design — everything static-shape, one jitted step per scan:

* **Merged voxel map** (:class:`LocalMap`): a fixed-capacity row buffer,
  one fused entry per occupied world-frame voxel, holding the running
  (count-weighted) mean position and the running mean of the normals'
  outer products n n^T.  Merging a scan is a lexsort + segment-mean over
  the union of the current rows and the scan's points — O((cap+n) log) on
  the VPU, no host sync, shapes static.  Running means matter doubly:
  sensor noise averages down as scans accumulate, and there is never more
  than ONE copy of a surface in the map.  (A ring buffer of per-scan
  voxelizations — the first design — keeps `slots` slightly-misaligned
  copies of every surface; once their misalignment exceeds the noise the
  pt2pl residual landscape grows multiple walls, Gauss-Newton oscillates
  between them, and one bad solve poisons the ring irrecoverably —
  measured divergence at scan ~40 of the noisy test sequence.)
* **LRU eviction**: every row carries the scan index that last observed
  it; when occupied voxels exceed capacity, the stalest rows are dropped
  (a sort by recency) — the map slides along the trajectory.
* **Orientation-free normal fusion**: voxel entries accumulate n n^T
  (6 unique entries) rather than signed normals, and the registration
  target's normal is the principal eigenvector.  Averaging SIGNED normals
  is a trap: any orientation rule (viewpoint, +z, ...) has flip
  boundaries, and averaging across one cancels the normal into a garbage
  direction (measured: 3e-4 fixed-point shift per solve on a CLEAN scene).
* **Bounded sentinel**: empty rows sit just outside the valid bounding box
  (hi + 2*extent), not at a fixed 1e6 — a far sentinel inflates the
  cluster index's Hilbert bounding box ~1e5x, collapsing all real points
  into one quantization cell (measured: certification 14%, 11% of queries
  matched wrong map points, 4.6e-3 pose bias per solve).
* **Absolute-pose solve with DAMPED motion prediction**: the map lives in
  the world frame, so the registration's T_init is the *predicted world
  pose* and its result IS the world pose — no relative-chain composition.
  The prediction is an EMA of relative-motion logs, not a raw
  last-relative extrapolation; the raw version amplifies per-solve error
  faster than the solver contracts it against an accumulated noisy map
  and the trajectory RATCHETS into divergence (full failure analysis in
  :func:`scan_to_map_odometry`).

Accuracy contract (tests/test_mapping.py): on a noisy synthetic sequence,
the final scan-to-map pose error stays BOUNDED while scan-to-scan drifts
past it (96 scans, sigma=0.04: 6.4e-3 vs 2.7e-2); on a clean sequence the
trajectory is recovered to ~voxel-curvature bias (~2e-5).
"""

from __future__ import annotations

import functools
from typing import Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dicp_tpu.config import ICPConfig
from dicp_tpu.odometry import OdometryResult
from dicp_tpu.registration import register
from dicp_tpu import se3

# Initial placeholder for empty rows (replaced by the dynamic bounded
# sentinel after the first merge).
_MAP_PAD = 1.0e6
# Voxel observation counts are deliberately UNCAPPED: a capped count turns
# the running mean into an EMA over the trailing cap/obs-rate scans, and
# once the earliest (best-posed) observations wash out of that window the
# map stops anchoring anything — the pose estimate random-walks with gain
# ~1 and diverges (measured: stable for exactly ~_cap scans, then runaway,
# 5e-3 -> 1e5 ATE between scans 36 and 44 with cap=32).  Uncapped, a mature
# voxel moves by only 1/k per new observation, so the anchor stiffens over
# time; geometry that leaves the sensor's view is still dropped wholesale
# by LRU eviction.


class LocalMap(NamedTuple):
    """Fixed-capacity fused world-frame voxel map (a pytree; jit-carryable).

    One row per occupied voxel: running-mean position, running-mean normal
    outer product (6 unique entries of n n^T), observation count, and the
    scan index that last observed the voxel (LRU eviction key).
    """

    pos: jnp.ndarray      # (cap, 3) count-weighted mean point per voxel
    m2: jnp.ndarray       # (cap, 6) mean outer product (xx,yy,zz,xy,xz,yz)
    count: jnp.ndarray    # (cap,) accumulated observation count (0 = empty)
    last: jnp.ndarray     # (cap,) int32 scan index of last observation
    step: jnp.ndarray     # () int32 — number of merges so far


def empty_map(cap: int, dtype=jnp.float32) -> LocalMap:
    return LocalMap(pos=jnp.full((cap, 3), _MAP_PAD, dtype),
                    m2=jnp.zeros((cap, 6), dtype),
                    count=jnp.zeros((cap,), dtype),
                    last=jnp.full((cap,), -1, jnp.int32),
                    step=jnp.int32(0))


def _outer6(n: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) unit normals -> (..., 6) unique entries of n n^T."""
    return jnp.stack([n[..., 0] * n[..., 0], n[..., 1] * n[..., 1],
                      n[..., 2] * n[..., 2], n[..., 0] * n[..., 1],
                      n[..., 0] * n[..., 2], n[..., 1] * n[..., 2]], axis=-1)


def _principal_normals(m2: jnp.ndarray) -> jnp.ndarray:
    """(cap, 6) mean outer products -> (cap, 3) principal directions.

    The principal eigenvector of PSD M equals the smallest eigenvector of
    tr(M) I - M (eigenvalues tr-lam reverse the order).
    """
    from dicp_tpu.ops.normals import smallest_eigvec_sym3

    a, b, c, d, e, f = (m2[:, 0], m2[:, 1], m2[:, 2],
                        m2[:, 3], m2[:, 4], m2[:, 5])
    m3 = jnp.stack([jnp.stack([a, d, e], -1), jnp.stack([d, b, f], -1),
                    jnp.stack([e, f, c], -1)], -2)
    tr = (a + b + c)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m2.dtype), m3.shape)
    return smallest_eigvec_sym3(tr * eye - m3)


def map_target(m: LocalMap, with_normals: bool = True) -> jnp.ndarray:
    """Registration target (cap, 6): fused points + principal normals
    (zero normals for empty rows / ``with_normals=False``)."""
    if with_normals:
        nrm = jnp.where((m.count > 0)[:, None],
                        _principal_normals(m.m2), 0.0)
    else:
        nrm = jnp.zeros_like(m.pos)
    return jnp.concatenate([m.pos, nrm], axis=1)


@functools.partial(jax.jit, static_argnames=("voxel", "with_normals", "mode"))
def map_merge(m: LocalMap, scan_world: jnp.ndarray, voxel: float,
              with_normals: bool = True, mode: str = "freeze") -> LocalMap:
    """Fuse a world-frame scan into the map; voxels beyond capacity are
    evicted stalest-first (LRU).

    Every (map row ∪ scan point) is re-bucketed into world voxels in one
    lexsort + segment-reduction pass.  ``mode``:

    * ``"mean"``: count-weighted running means — sensor noise averages
      down as observations of a voxel accumulate, and a mature voxel moves
      by only 1/k per new observation (counts deliberately uncapped: a
      capped count turns the mean into an EMA whose window forgets the
      earliest, best-posed observations, dissolving the anchor).
    * ``"freeze"``: a voxel's position/normal are fixed at its FIRST
      observation; later scans only refresh recency/count, and new voxels
      are appended as geometry is discovered (LOAM-style append-only).
      Structurally immune to estimate->map feedback — the conservative
      choice for very long runs; measured slightly less accurate than
      ``"mean"`` (9.1e-3 vs 6.4e-3 final pose error on the 96-scan noisy
      sequence).

    Either mode is stable only together with the DAMPED motion prediction
    in :func:`scan_to_map_odometry` — see there for the failure mode.
    """
    if mode not in ("freeze", "mean"):
        raise ValueError(f"mode must be freeze|mean, got {mode}")
    cap = m.pos.shape[0]
    dtype = m.pos.dtype
    pts = scan_world[:, :3]
    if with_normals:
        from dicp_tpu.ops.normals import estimate_normals_weighted

        u_new = _outer6(estimate_normals_weighted(pts))
    else:
        u_new = jnp.zeros((pts.shape[0], 6), dtype)

    # union rows: [pos(3), u(6)], weights, recency
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    old_valid = m.count > 0
    # invalid old rows: zero weight, parked just beyond the union's bbox so
    # they share one voxel cell and evict first — parking at a huge fixed
    # coordinate would overflow the int32 cell index below
    lo_u = jnp.minimum(
        jnp.min(jnp.where(old_valid[:, None], m.pos, big), axis=0),
        jnp.min(pts, axis=0))
    hi_u = jnp.maximum(
        jnp.max(jnp.where(old_valid[:, None], m.pos, -big), axis=0),
        jnp.max(pts, axis=0))
    park = hi_u + 4.0 * (hi_u - lo_u) + 1.0
    old_pos = jnp.where(old_valid[:, None], m.pos, park[None, :])
    all_pos = jnp.concatenate([old_pos, pts])
    all_u = jnp.concatenate([m.m2, u_new])
    all_w = jnp.concatenate([m.count, jnp.ones((pts.shape[0],), dtype)])
    all_w = jnp.where(jnp.concatenate(
        [old_valid, jnp.ones((pts.shape[0],), bool)]), all_w, 0.0)
    all_last = jnp.concatenate(
        [m.last, jnp.full((pts.shape[0],), 1, jnp.int32) * (m.step + 1)])
    all_last = jnp.where(all_w > 0, all_last, -1)

    cell = jnp.floor(all_pos / voxel).astype(jnp.int32)
    order = jnp.lexsort((cell[:, 2], cell[:, 1], cell[:, 0]))
    cell_s, pos_s, u_s = cell[order], all_pos[order], all_u[order]
    w_s, last_s = all_w[order], all_last[order]
    is_old = (order < cap).astype(dtype)        # union row came from the map

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(cell_s[1:] != cell_s[:-1], axis=1)])
    seg_idx = jnp.cumsum(new_seg) - 1
    R = all_pos.shape[0]
    # weighted sums per voxel, old map rows and new scan rows SEPARATELY
    # (a voxel has at most one old row — map rows are unique by cell)
    wo = (w_s * is_old)[:, None]
    wn = (w_s * (1.0 - is_old))[:, None]
    aug = jnp.concatenate([pos_s * wo, u_s * wo, wo,
                           pos_s * wn, u_s * wn, wn], axis=1)
    agg = jax.ops.segment_sum(aug, seg_idx, num_segments=R,
                              indices_are_sorted=True)
    w_old, w_new = agg[:, 9], agg[:, 19]
    d_old = jnp.where(w_old > 0, w_old, 1.0)[:, None]
    d_new = jnp.where(w_new > 0, w_new, 1.0)[:, None]
    pos_old, u_old = agg[:, 0:3] / d_old, agg[:, 3:9] / d_old
    pos_new, u_new_seg = agg[:, 10:13] / d_new, agg[:, 13:19] / d_new
    w_seg = w_old + w_new
    if mode == "freeze":
        # first observation wins; new scans only append fresh voxels
        take_old = (w_old > 0)[:, None]
        pos_seg = jnp.where(take_old, pos_old, pos_new)
        u_seg = jnp.where(take_old, u_old, u_new_seg)
    else:
        denom = jnp.where(w_seg > 0, w_seg, 1.0)[:, None]
        pos_seg = (pos_old * w_old[:, None] + pos_new * w_new[:, None]) / denom
        u_seg = (u_old * w_old[:, None] + u_new_seg * w_new[:, None]) / denom
    last_seg = jax.ops.segment_max(last_s, seg_idx, num_segments=R,
                                   indices_are_sorted=True)

    # keep the cap most-recent voxels (LRU): stable sort by -last, with
    # empty segments (w == 0) forced stalest
    last_key = jnp.where(w_seg > 0, last_seg, jnp.int32(-2)).astype(jnp.int32)
    keep = jnp.argsort(-last_key, stable=True)[:cap]
    pos_k, u_k = pos_seg[keep], u_seg[keep]
    w_k, last_k = w_seg[keep], last_seg[keep]
    valid = w_k > 0

    # bounded dynamic sentinel for empty rows: just outside the valid bbox
    # (hi + 2*extent) — far enough to never win a NN query, close enough to
    # keep the cluster index's 10-bit Hilbert quantization meaningful
    lo = jnp.min(jnp.where(valid[:, None], pos_k, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pos_k, -big), axis=0)
    pad = hi + 2.0 * (hi - lo) + 1.0
    pos_k = jnp.where(valid[:, None], pos_k, pad[None, :])
    u_k = jnp.where(valid[:, None], u_k, 0.0)
    return LocalMap(pos=pos_k, m2=u_k,
                    count=jnp.where(valid, w_k, 0.0),
                    last=jnp.where(valid, last_k, -1),
                    step=m.step + 1)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "voxel", "insert", "merge_mode",
                                    "solver", "sgd_minibatch",
                                    "sgd_iterations", "sgd_max_correction",
                                    "merge_subsample"))
def map_step(m: LocalMap, scan: jnp.ndarray, t_pred: jnp.ndarray,
             weight: Optional[jnp.ndarray], cfg: ICPConfig,
             voxel: float, insert: bool = True, merge_mode: str = "freeze",
             solver: str = "gn", key: Optional[jax.Array] = None,
             sgd_minibatch: int = 2048, sgd_iterations: int = 40,
             sgd_max_correction: float = 0.5,
             merge_subsample: Optional[int] = None,
             deq: Optional[jnp.ndarray] = None):
    """One scan-to-map odometry step, fully on device.

    Solves scan -> map from the predicted world pose ``t_pred`` (the result
    is the absolute world pose), then (``insert``) fuses the posed scan
    into the map.  Returns (pose (4,4), converged (), iterations (),
    new_map).

    ``solver``: ``"gn"`` (full Gauss-Newton over every scan point — the
    accuracy default) or ``"sgd"`` (stochastic mini-batch GN,
    :func:`dicp_tpu.sgd_icp.register_sgd`, ``key`` required): the
    correspondence pass — the dominant per-iteration cost at serving
    scale (BENCH.md: 5.85 ms of the 60k-vs-65k GN iteration) — runs over
    ``sgd_minibatch`` sampled points instead of all n.  The merged map is
    what averages the residual mini-batch noise down: each voxel's
    running mean integrates many scans, so the map (and hence later
    poses) is far less noisy than any single stochastic solve.

    ``merge_subsample``: merge only a strided subset of the posed scan
    (the SOLVE still uses every point).  The per-scan merge cost is
    dominated by estimating the incoming scan's normals (6.6 of 14.8 ms
    at 60k, benchmarks/exp_merge.py) plus the union-row sort/reduce —
    both scale with the merged row count, while the map's running means
    integrate observations ACROSS scans anyway: a voxel seen by a third
    of each scan for 3 scans has the same observation count as one full
    merge.  A strided subset is spatially systematic for ordered sensor
    scans.

    Divergence guard: a non-converged solve is NOT merged (its pose is
    still reported) — one bad solve must not poison the map.  For
    ``"sgd"`` the guard (and the returned ``converged`` flag) is a
    POSE-CONSISTENCY gate — finite pose whose correction
    ``log(t_pred^-1 pose)`` has norm <= ``sgd_max_correction`` — not the
    solver's EMA-streak flag: the streak measures whether mini-batch
    step norms settled below ``cfg.tolerance``, which at tight
    tolerances is a property of sampling noise (~sigma/sqrt(k) per step,
    measured never firing at 1e-4 on a clean scene whose pose error was
    4.6e-4), not of solve quality.  A healthy warm-started correction is
    prediction-error-sized (<< motion step); a diverged solve lands
    scene-scale away from the prediction.
    """
    if solver not in ("gn", "sgd"):
        raise ValueError(f"solver must be gn|sgd, got {solver}")
    if solver == "sgd" and key is None:
        raise ValueError("solver='sgd' needs an explicit PRNG key (the "
                         "mini-batch sampler must be reproducible)")
    if deq is not None:
        # scan arrived as the pipeline's packed uint16 transfer (8 B/point
        # over the wire instead of 12 — the scan-to-map host loop is
        # h2d-transfer-bound, BENCH.md); decode fuses into this program
        from dicp_tpu.pipeline import dequantize_scan

        scan = dequantize_scan(scan, deq)
    with_normals = cfg.icp_type != "pt2pt"
    # full-precision matmuls: the TPU's default bf16 pass corrupts world
    # coordinates by ~4 cm at +-20 m (the round-1 data-gen trap, BENCH.md)
    with jax.default_matmul_precision("float32"):
        target = map_target(m, with_normals)
        if solver == "sgd":
            from dicp_tpu.sgd_icp import register_sgd

            res = register_sgd(
                scan[None, :, :3], target[None], t_pred[None], key,
                None if weight is None else weight[None],
                icp_type=cfg.icp_type, minibatch=sgd_minibatch,
                iterations=sgd_iterations, optimizer="gn",
                loss_name=cfg.loss_name, loss_metric=cfg.loss_metric,
                trim_dist=cfg.trim_dist, tolerance=cfg.tolerance,
                nn_method=cfg.nn_method)
            pose = res.T[0]
            corr = se3.tran2vec(se3.compose(se3.tran_inv(t_pred), pose))
            ok = (jnp.all(jnp.isfinite(pose))
                  & (jnp.linalg.norm(corr) <= sgd_max_correction))
        else:
            res = register(scan[None, :, :3], target[None], t_pred[None],
                           None if weight is None else weight[None], cfg)
            pose = res.T[0]
            ok = res.converged[0]
        scan_world = scan[:, :3] @ pose[:3, :3].T + pose[:3, 3]
    if insert:
        merge_pts = scan_world
        if merge_subsample is not None and merge_subsample < scan.shape[0]:
            stride = -(-scan.shape[0] // merge_subsample)
            merge_pts = scan_world[::stride]
        merged = map_merge(m, merge_pts, voxel, with_normals=with_normals,
                           mode=merge_mode)
        new_map = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(ok, (1,) * a.ndim) if a.ndim else ok, a, b),
            merged, m._replace(step=m.step + 1))
    else:
        new_map = m
    return pose, ok, res.iterations[0], new_map


def scan_to_map_odometry(
    scans: Iterable[Tuple[np.ndarray, np.ndarray]],
    cfg: ICPConfig = ICPConfig(icp_type="pt2pl", differentiable=False,
                               collect_histories=False),
    capacity: int = 65536,
    voxel: float = 0.25,
    warm_start: bool = True,
    insert_every: int = 1,
    merge_mode: str = "mean",
    pred_alpha: float = 0.3,
    solver: str = "gn",
    sgd_minibatch: int = 2048,
    sgd_iterations: int = 40,
    sgd_max_correction: float = 0.5,
    merge_subsample: Optional[int] = None,
    quantize: bool = False,
    seed: int = 0,
) -> OdometryResult:
    """Streaming scan-to-map odometry over (points, weight) numpy pairs.

    The first scan seeds the map at identity.  Every later scan solves
    against the current fused map from a predicted world pose and is then
    merged into it.  The host loop never fetches inside the stream — poses
    come back as device futures, exactly like
    :func:`dicp_tpu.pipeline.stream_odometry`.

    **Motion prediction is EMA-damped, and that is load-bearing.**
    ``warm_start=True`` predicts t_pred = prev_pose @ exp(xi_ema) where
    xi_ema is an exponential moving average (``pred_alpha``) of the
    relative-motion logs.  The obvious choice — extrapolating with the
    RAW last relative transform — amplifies per-solve pose error ~2-3x
    per step; against an accumulated noisy map the solver's contraction
    along the scene's weakest direction can be as mild as ~0.6, the
    product exceeds 1, and the trajectory error RATCHETS exponentially
    (measured on the noisy test sequence: stable to scan ~36, then
    2e-2 -> 0.1 -> 0.25 -> ... doubling per scan, regardless of merge
    mode and even with oracle insertion poses).  The EMA cuts the
    prediction's error gain ~3x while keeping the constant-velocity
    benefit; ``warm_start=False`` (predict with prev_pose) is equally
    stable, one motion-step less accurate an init.

    ``cfg.icp_type``: ``pt2pl`` (default — the map fuses normal outer
    products, and the plane projection removes the tangential
    voxel-quantization bias) or ``pt2pt`` (point-only map, cheaper inserts).

    ``merge_mode``: ``"mean"`` (default; measured best — 96-scan noisy
    sequence final pose error 6.4e-3 vs scan-to-scan's 2.7e-2) or
    ``"freeze"`` (append-only; 9.1e-3 there — structurally immune to
    estimate->map feedback, the conservative choice for very long runs).

    ``insert_every`` (keyframe thinning): merge only every k-th scan —
    cheaper on dense streams; accuracy usually prefers 1 (running means
    WANT many observations).

    ``solver="sgd"``: stochastic mini-batch front-end (see
    :func:`map_step` for the pose-consistency merge gate that replaces
    the EMA-streak convergence flag) — the throughput mode for dense
    streams; per-scan mini-batch keys are derived deterministically from
    ``seed`` via ``fold_in(key(seed), scan_index)``.

    ``quantize``: ship each scan host->device as the pipeline's packed
    (n, 4) uint16 transfer (8 B/point at ~20-bit xy resolution,
    dequantized inside the solve program; quantization math runs in a
    prefetch thread).  The host loop is h2d-transfer-bound — in a
    congestion window the solver choice barely moved it while the f32
    scan transfer dominated (BENCH.md) — so fewer bytes is the serving
    lever.  Requires weightless scans (``weight is None``); adds the
    quantization's ~1e-4-scale fixed-point shift (same mechanism as the
    pipeline's measured 1.16e-4 at 60k).
    """
    if cfg.icp_type not in ("pt2pt", "pt2pl"):
        raise ValueError("scan_to_map_odometry supports icp_type pt2pt|pt2pl "
                         "(the map stores fused points+normals); got %r"
                         % cfg.icp_type)
    m = None
    poses = []
    convs = []
    iters = []
    prev_pose = None
    xi_ema = None
    base_key = jax.random.key(seed) if solver == "sgd" else None
    # encode (when quantizing) AND device_put in a daemon prefetch thread:
    # an inline jnp.asarray of a 60k-pt scan is a BLOCKING ~20 ms h2d on
    # the main thread, serializing transfer after the previous dispatch
    # instead of overlapping it with the device solve
    from dicp_tpu.pipeline import _prefetched, _quantize_host

    def _prep(stream):
        for pts_np, w_np in stream:
            if quantize:
                if w_np is not None:
                    raise ValueError(
                        "quantize=True requires weightless scans "
                        "(weight transfer would defeat the byte budget; "
                        "pass weight=None)")
                parts_np, deq_np = _quantize_host(pts_np)
                yield (tuple(jnp.asarray(p) for p in parts_np),
                       jnp.asarray(deq_np), None, pts_np)
            else:
                yield (jnp.asarray(pts_np), None,
                       None if w_np is None else jnp.asarray(w_np), pts_np)

    k = 0
    for scan, deq, w, pts_np in _prefetched(_prep(scans)):
        if m is None:
            # seed scan: one full-precision f32 transfer (a one-off; the
            # steady-state loop ships only the packed arrays)
            seed = (jnp.asarray(np.asarray(pts_np[:, :3], np.float32))
                    if quantize else scan[:, :3])
            dtype = seed.dtype
            m = empty_map(capacity, dtype)
            pose = jnp.eye(4, dtype=dtype)
            m = map_merge(m, seed, voxel,
                          with_normals=cfg.icp_type != "pt2pt",
                          mode=merge_mode)
            conv = jnp.asarray(True)
            it = jnp.asarray(0, jnp.int32)
            xi_ema = jnp.zeros((6,), dtype)
        else:
            if warm_start:
                t_pred = se3.compose(prev_pose, se3.vec2tran(xi_ema))
            else:
                t_pred = prev_pose
            pose, conv, it, m = map_step(
                m, scan, t_pred, w, cfg, voxel,
                insert=(k % insert_every == 0), merge_mode=merge_mode,
                solver=solver,
                key=(None if base_key is None
                     else jax.random.fold_in(base_key, k)),
                sgd_minibatch=sgd_minibatch, sgd_iterations=sgd_iterations,
                sgd_max_correction=sgd_max_correction,
                merge_subsample=merge_subsample, deq=deq)
            rel = se3.compose(se3.tran_inv(prev_pose), pose)
            xi_ema = ((1.0 - pred_alpha) * xi_ema
                      + pred_alpha * se3.tran2vec(rel))
        poses.append(pose)
        convs.append(conv)
        iters.append(it)
        prev_pose = pose
        k += 1
    if len(poses) < 2:
        raise ValueError("scan_to_map_odometry needs at least two scans")
    poses = jnp.stack(poses)
    rel = jax.vmap(lambda a, b: se3.compose(se3.tran_inv(a), b))(
        poses[:-1], poses[1:])
    return OdometryResult(poses=poses, rel_transforms=rel,
                          converged=jnp.stack(convs),
                          iterations=jnp.stack(iters))
