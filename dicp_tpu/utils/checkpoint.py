"""Checkpoint / resume for long odometry runs.

The reference is a stateless solver with nothing to checkpoint (SURVEY.md
§5); the odometry application layer introduces real state: accumulated
poses, relative transforms, and pose-graph edges.  Stored as a single .npz
(atomic rename) — trivially portable, no orbax dependency for this small
state; swap in orbax for sharded multi-host state when trajectories outgrow
one host.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np


def save_odometry_state(path: str, poses, rel_transforms=None,
                        edges_i=None, edges_j=None, t_meas=None, info=None,
                        step: Optional[int] = None, **extra) -> None:
    """Atomically persist odometry/pose-graph state (plus any extra arrays)."""
    arrays = {"poses": np.asarray(poses)}
    arrays.update({k: np.asarray(v) for k, v in extra.items()})
    if rel_transforms is not None:
        arrays["rel_transforms"] = np.asarray(rel_transforms)
    if edges_i is not None:
        if edges_j is None or t_meas is None or info is None:
            # np.asarray(None) is a pickled OBJECT array: np.savez accepts
            # it, the atomic replace destroys the previous good checkpoint,
            # and load (allow_pickle=False) then raises — fail BEFORE
            # writing instead (code-review r3).
            raise ValueError("edges_i requires edges_j, t_meas and info "
                             "(got None) — refusing to write an unloadable "
                             "checkpoint")
        arrays["edges_i"] = np.asarray(edges_i)
        arrays["edges_j"] = np.asarray(edges_j)
        arrays["t_meas"] = np.asarray(t_meas)
        arrays["info"] = np.asarray(info)
    if step is not None:
        arrays["step"] = np.asarray(step)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    # NB: write through a file object — np.savez appends '.npz' to bare paths
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_odometry_state(path: str) -> dict:
    """Load a checkpoint saved by :func:`save_odometry_state`."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
