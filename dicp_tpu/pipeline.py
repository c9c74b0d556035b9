"""Streaming odometry serving pipeline: overlap host, transfer, and device.

The online-SLAM serving path (no reference counterpart — the reference is a
single-pair solver, SURVEY.md §1).  Round-2 measured the naive loop (one
solve dispatch per scan pair, result consumed immediately) at 30.5 fps on
raw 60k-point scans; host preprocessing itself costs only ~1.4 ms/frame
(benchmarks/exp_pipeline.py ``host`` mode), so the loop was bound by
per-pair dispatch/transfer latency through the remote runtime — not compute.

Design (VERDICT r2 #3):

* **one transfer per scan** — each preprocessed scan is ``device_put`` once
  and reused as the target of the next pair (the naive batched variant
  shipped every scan twice, once in the source stack and once in the
  target stack);
* **windowed dispatch** — K consecutive pairs solve in ONE jitted program
  that takes the K+1 scans as separate arguments and stacks/slices them
  on-device (a single dispatch per K pairs instead of K, and no host-side
  re-stacking);
* **asynchronous depth** — results come back as device futures; nothing
  is fetched inside the feed loop, so while the host preprocesses scans
  for window w+1 the device still owes windows <= w.  JAX dispatch is
  async; keeping >= 2 windows in flight hides the solve behind the
  host/transfer time of the next window.

Per-pair results are identical to the one-dispatch-per-pair loop (the
batch==serial invariant of the solver, tests/test_icp_inputs.py).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dicp_tpu.config import ICPConfig
from dicp_tpu.odometry import OdometryResult, compose_chain
from dicp_tpu.registration import register


@functools.partial(jax.jit, static_argnames=("cfg", "n_pairs"))
def _window_solve(scans: Tuple[jnp.ndarray, ...],
                  weights: Optional[Tuple[jnp.ndarray, ...]],
                  t_init: jnp.ndarray,
                  cfg: ICPConfig, n_pairs: int,
                  deq: Optional[Tuple[jnp.ndarray, ...]] = None):
    """Solve the n_pairs consecutive pairs of a (n_pairs+1)-scan window in
    one XLA program.  scans/weights are tuples of (n, c) / (n,) arrays —
    passing them unstacked means the host never pays a stacking dispatch
    and each scan crossed the host->device link exactly once.  ``t_init``
    (4, 4) seeds every pair of the window (identity, or the previous
    window's last relative transform under the constant-velocity prior).

    ``weights=None`` skips the weight transfer entirely (trivial all-ones
    weights were measured to cost 20% of the h2d budget on raw 60k scans
    — and the loop is transfer-bound, BENCH.md pipeline phase table).

    ``deq``: when scans arrive quantized (see :func:`stream_registrations`
    ``quantize``), each scan is one packed (n, 4) uint16 array [in-tile
    coords | xy-tile id] (plus an int8 normal array for 6-col scans) and
    ``deq`` holds one (3, 3) f32 [lo; step; tile] per scan; dequantization
    happens HERE, fused into the solve program — the wire carries 8
    bytes/point instead of 12 at ~20-bit xy resolution, in a single
    transfer per scan (each extra device_put pays a tunnel RTT)."""
    if deq is not None:
        pts = jnp.stack([dequantize_scan(qt, d)
                         for qt, d in zip(scans, deq)])
    else:
        pts = jnp.stack(scans)                  # (K+1, n, c)
    w = None if weights is None else jnp.stack(weights[1:])   # (K, n)
    src = pts[1:, :, :3]
    tgt = pts[:-1]
    ti = jnp.broadcast_to(t_init.astype(pts.dtype), (n_pairs, 4, 4))
    with jax.default_matmul_precision("float32"):
        res = register(src, tgt, ti, w, cfg)
    return res.T, res.converged, res.iterations


def stream_registrations(
    scans: Iterable[Tuple[np.ndarray, Optional[np.ndarray]]],
    cfg: ICPConfig = ICPConfig(),
    window: int = 8,
    warm_start: bool = True,
    quantize: bool = False,
) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Register consecutive scan pairs from a stream, window at a time.

    ``scans`` yields (points (n, c), weight (n,)) numpy pairs (e.g. a
    :class:`dicp_tpu.io.ScanDataset`); every scan must share one static
    shape.  Yields (rel_T (k, 4, 4), converged (k,), iterations (k,))
    *device arrays* per window — they are futures: consuming them lazily
    (or only at the end) keeps multiple windows in flight on the device
    while the host prepares the next one.

    ``warm_start`` (the constant-velocity odometry prior): seed each
    dispatch's T_init with the latest solved relative transform instead of
    identity — consecutive scans move nearly alike, so the solver starts
    ~one step from its fixed point.  The seed is a device future; no host
    fetch enters the loop, so dispatches stay fully async.  Measured
    (benchmarks/exp_pipeline.py, raw 60k-pt scans, v5e): per-pair 44.6 fps
    warm vs 18.2 cold, and *more* accurate (4.0e-7 vs 7.8e-7 rel err — the
    fixed point is closer so fewer large steps).  With ``window > 1`` the
    whole next window is seeded by the previous window's last transform.

    A ragged tail (< window pairs) is padded by repeating the last scan so
    the solver sees one compiled shape; pad pairs are self-registrations
    (converge immediately) and are sliced off before yielding.

    ``quantize`` (the transfer-bound serving fix, VERDICT r4 #2): the loop
    on raw 60k-pt scans is bound by the host->device link, not compute —
    measured 22.9 ms/frame for the 983 KB f32 transfer alone (43.8 fps
    ceiling) vs ~5 ms of non-hidden solve.  With ``quantize=True`` each
    scan ships as fixed-point grid coordinates relative to its own
    bounding box — a 16x16 xy tile grid (the high bits) plus uint16 in-tile
    coordinates (the low bits), packed into ONE (n, 4) uint16 array: 8
    bytes/point instead of 12 at ~20-bit xy resolution (step =
    extent/16/65535 ~ 4e-5 on a 40 m scan), one transfer per scan.
    Dequantization fuses into the solve program.  Resolution matters because grid-snapping is NOT
    averaging noise: both clouds snap to different lattices, the
    correspondence fixed point shifts by ~step/5 SYSTEMATICALLY (measured
    8e-5 at a plain-uint16 6e-4 step, invariant in n — same mechanism as
    the BENCH.md voxel-sweep error floor), so plain uint16 just misses
    the 1e-4 serving accuracy bar while the tiled 20-bit encoding sits
    ~30x below it for one extra byte.  Accuracy measured in the suite's
    ``pipeline_stream_*_q16`` rows.  Weights may be ``None`` to skip
    their transfer (another 20% of the budget when trivial).
    """
    dev_scans: List = []
    dev_w: List = []
    dev_deq: List[jnp.ndarray] = []
    t_seed = jnp.eye(4, dtype=jnp.float32)
    no_w = None

    def flush():
        nonlocal t_seed
        k = len(dev_scans) - 1
        pad = window - k
        s = tuple(dev_scans) + (dev_scans[-1],) * pad
        if no_w:
            w = None
        else:
            w = tuple(dev_w) + (dev_w[-1],) * pad
        dq = (tuple(dev_deq) + (dev_deq[-1],) * pad) if quantize else None
        T, conv, iters = _window_solve(s, w, t_seed, cfg, window, dq)
        if warm_start:
            t_seed = T[k - 1]   # device future — no host sync
        return T[:k], conv[:k], iters[:k]

    def prep(item):
        """Per-scan host work (the quantize math runs HERE so the prefetch
        thread below overlaps it with the dispatch loop — on the main
        thread it cost ~4 ms/frame = a 20% fps regression, measured)."""
        pts_np, w_np = item
        if not quantize:
            return pts_np, w_np, None
        return _quantize_host(pts_np) + (w_np,)

    if quantize:
        items = _prefetched(map(prep, iter(scans)), depth=3)
    else:
        items = map(prep, iter(scans))

    for item in items:
        if quantize:
            parts_np, deq_np, w_np = item
            dev_scans.append(tuple(jax.device_put(jnp.asarray(p))
                                   for p in parts_np))
            dev_deq.append(jax.device_put(jnp.asarray(deq_np)))
        else:
            pts_np, w_np, _ = item
            dev_scans.append(jax.device_put(jnp.asarray(pts_np)))
        if no_w is None:
            no_w = w_np is None
        elif no_w != (w_np is None):
            raise ValueError("all scans must consistently have or omit weights")
        if not no_w:
            dev_w.append(jax.device_put(jnp.asarray(w_np)))
        if len(dev_scans) == window + 1:
            out = flush()
            # the last scan seeds the next window (target of its first pair)
            dev_scans = dev_scans[-1:]
            dev_w = dev_w[-1:]
            dev_deq = dev_deq[-1:]
            yield out
    if len(dev_scans) >= 2:
        yield flush()


def dequantize_scan(qt: Tuple[jnp.ndarray, ...], d: jnp.ndarray) -> jnp.ndarray:
    """Device side of the quantized transfer (traceable; fuses into the
    consuming program).  ``qt`` = ((n, 4) uint16 [qx qy qz tile-id]
    [, (n, 3) int8 normals]); ``d`` = (3, 3) f32 [lo; step; tile] from
    :func:`_quantize_host`.  Returns (n, 3) or (n, 6) f32 points."""
    arr = qt[0]              # (n, 4) uint16: qx qy qz tile-id
    q, tid = arr[:, :3], arr[:, 3]
    tx = (tid >> 4).astype(jnp.float32)
    ty = (tid & 15).astype(jnp.float32)
    off = jnp.stack([tx * d[2, 0], ty * d[2, 1],
                     jnp.zeros_like(tx)], axis=-1)
    xyz = q.astype(jnp.float32) * d[1] + d[0] + off
    if len(qt) == 2:        # int8 normals (6-col scans)
        nrm = qt[1].astype(jnp.float32) / 127.0
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
        return jnp.concatenate([xyz, nrm], axis=-1)
    return xyz


def _quantize_host(pts_np: np.ndarray):
    """Host side of the quantized transfer: ((q uint16, tid uint8[, n int8]),
    deq (3, 3) f32) — see :func:`stream_registrations` ``quantize``."""
    full = np.asarray(pts_np, np.float32)
    xyz = full[:, :3]
    lo = xyz.min(axis=0)
    ext = np.maximum(xyz.max(axis=0) - lo, 1e-9)
    tile = np.array([ext[0] / 16.0, ext[1] / 16.0, 0.0], np.float32)
    tx = np.clip((xyz[:, 0] - lo[0]) // tile[0], 0, 15)
    ty = np.clip((xyz[:, 1] - lo[1]) // tile[1], 0, 15)
    tid = (tx.astype(np.uint8) << 4) | ty.astype(np.uint8)
    step = np.array([tile[0] / 65535.0, tile[1] / 65535.0,
                     ext[2] / 65535.0], np.float32)
    rel = xyz - lo
    rel[:, 0] -= tx * tile[0]
    rel[:, 1] -= ty * tile[1]
    q = np.clip(np.rint(rel / step), 0, 65535).astype(np.uint16)
    # ONE packed array per scan: each extra device_put pays a tunnel RTT
    # (measured ~10 ms/frame when tid shipped separately)
    arr = np.concatenate([q, tid[:, None].astype(np.uint16)], axis=1)
    parts = [arr]
    if full.shape[1] >= 6:       # normals ride as int8 (0.45 deg step)
        parts.append(np.clip(np.rint(full[:, 3:6] * 127.0),
                             -127, 127).astype(np.int8))
    return tuple(parts), np.stack([lo, step, tile]).astype(np.float32)


def _prefetched(it, depth: int = 3):
    """Run an iterator in a daemon thread with a bounded queue (numpy
    releases the GIL on array math, so host prep genuinely overlaps the
    dispatch loop)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def feed():
        try:
            for x in it:
                q.put(x)
            q.put(_END)
        except BaseException as e:   # surface errors in the consumer
            q.put(e)

    threading.Thread(target=feed, daemon=True).start()
    while True:
        x = q.get()
        if x is _END:
            return
        if isinstance(x, BaseException):
            raise x
        yield x


def stream_odometry(
    scans: Iterable[Tuple[np.ndarray, Optional[np.ndarray]]],
    cfg: ICPConfig = ICPConfig(),
    window: int = 8,
    warm_start: bool = True,
    quantize: bool = False,
) -> OdometryResult:
    """Run the streaming pipeline to completion and compose the trajectory.

    Only the final pose composition fetches from the device: all windows
    are dispatched back-to-back, overlapping host preprocessing with
    device solves.  ``window=1`` with ``warm_start`` is the measured-fastest
    serving mode on raw 60k-point scans (see :func:`stream_registrations`).
    """
    rels, convs, iters = [], [], []
    for T, c, it in stream_registrations(scans, cfg, window, warm_start,
                                         quantize):
        rels.append(T)
        convs.append(c)
        iters.append(it)
    if not rels:
        raise ValueError("stream_odometry needs at least two scans")
    rel = jnp.concatenate(rels)
    poses = compose_chain(rel)
    return OdometryResult(poses=poses, rel_transforms=rel,
                          converged=jnp.concatenate(convs),
                          iterations=jnp.concatenate(iters))
