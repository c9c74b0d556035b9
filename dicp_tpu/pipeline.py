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
                  weights: Tuple[jnp.ndarray, ...],
                  t_init: jnp.ndarray,
                  cfg: ICPConfig, n_pairs: int):
    """Solve the n_pairs consecutive pairs of a (n_pairs+1)-scan window in
    one XLA program.  scans/weights are tuples of (n, c) / (n,) arrays —
    passing them unstacked means the host never pays a stacking dispatch
    and each scan crossed the host->device link exactly once.  ``t_init``
    (4, 4) seeds every pair of the window (identity, or the previous
    window's last relative transform under the constant-velocity prior)."""
    pts = jnp.stack(scans)                      # (K+1, n, c)
    w = jnp.stack(weights[1:])                  # (K, n)
    src = pts[1:, :, :3]
    tgt = pts[:-1]
    ti = jnp.broadcast_to(t_init.astype(pts.dtype), (n_pairs, 4, 4))
    with jax.default_matmul_precision("float32"):
        res = register(src, tgt, ti, w, cfg)
    return res.T, res.converged, res.iterations


def stream_registrations(
    scans: Iterable[Tuple[np.ndarray, np.ndarray]],
    cfg: ICPConfig = ICPConfig(),
    window: int = 8,
    warm_start: bool = True,
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
    """
    dev_scans: List[jnp.ndarray] = []
    dev_w: List[jnp.ndarray] = []
    t_seed = jnp.eye(4, dtype=jnp.float32)

    def flush():
        nonlocal t_seed
        k = len(dev_scans) - 1
        pad = window - k
        s = tuple(dev_scans) + (dev_scans[-1],) * pad
        w = tuple(dev_w) + (dev_w[-1],) * pad
        T, conv, iters = _window_solve(s, w, t_seed, cfg, window)
        if warm_start:
            t_seed = T[k - 1]   # device future — no host sync
        return T[:k], conv[:k], iters[:k]

    for pts_np, w_np in scans:
        dev_scans.append(jax.device_put(jnp.asarray(pts_np)))
        dev_w.append(jax.device_put(jnp.asarray(w_np)))
        if len(dev_scans) == window + 1:
            out = flush()
            # the last scan seeds the next window (target of its first pair)
            dev_scans = dev_scans[-1:]
            dev_w = dev_w[-1:]
            yield out
    if len(dev_scans) >= 2:
        yield flush()


def stream_odometry(
    scans: Iterable[Tuple[np.ndarray, np.ndarray]],
    cfg: ICPConfig = ICPConfig(),
    window: int = 8,
    warm_start: bool = True,
) -> OdometryResult:
    """Run the streaming pipeline to completion and compose the trajectory.

    Only the final pose composition fetches from the device: all windows
    are dispatched back-to-back, overlapping host preprocessing with
    device solves.  ``window=1`` with ``warm_start`` is the measured-fastest
    serving mode on raw 60k-point scans (see :func:`stream_registrations`).
    """
    rels, convs, iters = [], [], []
    for T, c, it in stream_registrations(scans, cfg, window, warm_start):
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
