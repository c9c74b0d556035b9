"""Multi-device pose-graph optimization via keyframe partitioning and
Schur-complement reduction.

The dense back-end (:func:`dicp_tpu.odometry.pose_graph_optimize`) solves the
full (6V, 6V) normal equations on one device.  For trajectories that span a
pod slice, this module distributes one Gauss-Newton step the way
BASELINE.json's north star prescribes ("multi-host pose graph over
partitioned keyframes, Schur-reduced 6x6 blocks via psum"):

1. **Partition** the V keyframes contiguously over the ``map`` mesh axis.
   Poses incident to any cross-partition edge become *separators*
   (replicated); the rest are *interiors* (owned by exactly one device).  For
   an odometry chain with sparse loop closures the separator set is tiny (one
   pose per partition boundary + loop-closure endpoints).
2. **Local elimination**: each device assembles the normal-equation blocks of
   its own edges only — H_II (block-diagonal across devices by construction),
   H_IS, H_SS, b_I, b_S — and eliminates its interiors with one local dense
   solve: X = H_II^{-1} [H_IS | b_I].
3. **Schur reduction**: the per-device contributions to the separator system,
   S_k = H_SS^k - H_SI X and rhs_k = b_S^k - H_SI x_b, are ``psum``-reduced
   over the mesh — (6S)^2 + 6S floats per GN step for S separators.
4. **Back-substitution**: every device solves the (replicated) reduced
   separator system and recovers its interior updates locally; the full
   (V, 6) update is reassembled with one more psum (interiors are disjoint
   across devices, so the sum is a concatenation).

With identical damping this is algebraically exact block elimination of the
damped dense system — the partitioned solver matches the dense one to solver
precision (tests/test_pose_graph_partitioned.py).  (The only deviation: the
separator diagonal receives K copies of the Tikhonov term, i.e. K*damping
instead of damping — still a valid, negligible damping.)

All partitioning runs host-side on the (host-known) graph structure; the
device program has static shapes (interiors padded to the per-part maximum,
edges padded with zero-information edges).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dicp_tpu import se3
from dicp_tpu.odometry import PoseGraph, edge_residual_and_jac


class Partition(NamedTuple):
    """Host-side partitioning artifacts (numpy, static shapes)."""
    int_ids: np.ndarray    # (K, I_max) global pose id per local interior, -1 pad
    sep_ids: np.ndarray    # (S,) global pose ids of separators (replicated)
    eg_i: np.ndarray       # (K, E_max) global pose id of edge endpoint i (0 pad)
    eg_j: np.ndarray       # (K, E_max)
    loc_i: np.ndarray      # (K, E_max) unified local index in [0, I_max + S)
    loc_j: np.ndarray      # (K, E_max)
    e_idx: np.ndarray      # (K, E_max) index into the global edge list (0 pad)
    e_valid: np.ndarray    # (K, E_max) 1.0 for real edges, 0.0 for padding
    gauge_dev: int         # device whose interior block holds pose 0, or -1
    gauge_loc: int         # local interior slot of pose 0 (interior case)
    gauge_sep: int         # separator index of pose 0, or -1


def partition_graph(n_poses: int, edges_i: np.ndarray, edges_j: np.ndarray,
                    n_parts: int) -> Partition:
    """Contiguous keyframe partition + separator extraction (host-side)."""
    edges_i = np.asarray(edges_i)
    edges_j = np.asarray(edges_j)
    part = np.minimum(np.arange(n_poses) * n_parts // n_poses, n_parts - 1)

    cross = part[edges_i] != part[edges_j]
    is_sep = np.zeros(n_poses, bool)
    is_sep[edges_i[cross]] = True
    is_sep[edges_j[cross]] = True
    sep_ids = np.flatnonzero(is_sep)
    if sep_ids.size == 0:
        # keep the separator system non-empty (degenerate: no cross edges)
        sep_ids = np.array([n_poses - 1])
        is_sep[n_poses - 1] = True
    S = sep_ids.size
    sep_index = -np.ones(n_poses, np.int64)
    sep_index[sep_ids] = np.arange(S)

    interiors = [np.flatnonzero((part == k) & ~is_sep) for k in range(n_parts)]
    I_max = max(1, max(len(ii) for ii in interiors))
    int_ids = -np.ones((n_parts, I_max), np.int32)
    int_index = -np.ones(n_poses, np.int64)   # local interior slot of each pose
    for k, ii in enumerate(interiors):
        int_ids[k, :len(ii)] = ii
        int_index[ii] = np.arange(len(ii))

    # assign each edge to the part owning its interior endpoint(s); edges
    # between two separators go to the part of endpoint i
    e_part = np.where(~is_sep[edges_i], part[edges_i],
                      np.where(~is_sep[edges_j], part[edges_j], part[edges_i]))
    per_part = [np.flatnonzero(e_part == k) for k in range(n_parts)]
    E_max = max(1, max(len(ee) for ee in per_part))

    eg_i = np.zeros((n_parts, E_max), np.int32)
    eg_j = np.zeros((n_parts, E_max), np.int32)
    # padding rows scatter into separator slot 0 with zero weight
    loc_i = np.full((n_parts, E_max), I_max, np.int32)
    loc_j = np.full((n_parts, E_max), I_max, np.int32)
    e_idx = np.zeros((n_parts, E_max), np.int32)
    e_valid = np.zeros((n_parts, E_max), np.float64)

    def unified(pose, k):
        # interiors -> [0, I_max); separators -> [I_max, I_max + S)
        if is_sep[pose]:
            return I_max + sep_index[pose]
        assert part[pose] == k, "edge assigned to a part not owning its interior"
        return int_index[pose]

    for k, ee in enumerate(per_part):
        for s, e in enumerate(ee):
            eg_i[k, s] = edges_i[e]
            eg_j[k, s] = edges_j[e]
            loc_i[k, s] = unified(edges_i[e], k)
            loc_j[k, s] = unified(edges_j[e], k)
            e_idx[k, s] = e
            e_valid[k, s] = 1.0

    if is_sep[0]:
        gauge_dev, gauge_loc, gauge_sep = -1, -1, int(sep_index[0])
    else:
        gauge_dev, gauge_loc, gauge_sep = int(part[0]), int(int_index[0]), -1

    return Partition(int_ids, sep_ids.astype(np.int32), eg_i, eg_j,
                     loc_i, loc_j, e_idx, e_valid,
                     gauge_dev, gauge_loc, gauge_sep)


def _make_device_body(I_max: int, S: int, sep_ids, iterations: int,
                      damping: float, gauge_sep: int, axis: str):
    """Build the shard_map body for `iterations` distributed GN steps."""

    def body(poses, t_meas, info, int_ids, eg_i, eg_j, loc_i, loc_j,
             e_valid, gauge_mask):
        dtype = poses.dtype
        V = poses.shape[0]
        # per-device arrays arrive with a leading length-1 block dim
        int_ids_, eg_i_, eg_j_ = int_ids[0], eg_i[0], eg_j[0]
        loc_i_, loc_j_ = loc_i[0], loc_j[0]
        t_meas_, info_, e_valid_ = t_meas[0], info[0], e_valid[0]
        gauge_mask_ = gauge_mask[0]     # (I_max,) 1.0 at pose 0's slot
        L = I_max + S
        nI, nS = I_max * 6, S * 6
        w_edge = info_ * e_valid_

        batched_rj = jax.vmap(
            lambda ti, tj, tm: edge_residual_and_jac(ti, tj, tm, dtype))

        def gn_body(poses, _):
            r, J_i, J_j = batched_rj(poses[eg_i_], poses[eg_j_], t_meas_)

            w = w_edge[:, None, None]
            H = jnp.zeros((L, 6, L, 6), dtype)
            b = jnp.zeros((L, 6), dtype)
            for rows, Jr in ((loc_i_, J_i), (loc_j_, J_j)):
                for cols, Jc in ((loc_i_, J_i), (loc_j_, J_j)):
                    H = H.at[rows, :, cols, :].add(
                        jnp.einsum("eab,eac->ebc", Jr * w, Jc))
                b = b.at[rows].add(jnp.einsum("eab,ea->eb", Jr * w, r))

            # damping everywhere (padded interior blocks become damping*I ->
            # invertible with zero rhs -> zero update); gauge-fix pose 0 by
            # exact row/col elimination (identity block, zero rhs) — a large
            # prior would square the condition number past float32.
            Hd = H.reshape(L * 6, L * 6) + damping * jnp.eye(L * 6, dtype=dtype)
            m = jnp.concatenate([jnp.repeat(gauge_mask_, 6),
                                 jnp.zeros((nS,), dtype)])
            Hd = Hd * (1.0 - m)[:, None] * (1.0 - m)[None, :] + jnp.diag(m)
            bv = b.reshape(-1) * (1.0 - m)

            H_II, H_IS, H_SS = Hd[:nI, :nI], Hd[:nI, nI:], Hd[nI:, nI:]
            b_I, b_S = bv[:nI], bv[nI:]

            # local elimination of interiors: X = H_II^{-1} [H_IS | b_I]
            X = jnp.linalg.solve(H_II, jnp.concatenate([H_IS, b_I[:, None]], axis=1))
            X_IS, x_b = X[:, :nS], X[:, nS]

            # Schur-reduced separator system: the ONLY collective per GN step
            S_red = lax.psum(H_SS - H_IS.T @ X_IS, axis)
            rhs_red = lax.psum(b_S - H_IS.T @ x_b, axis)
            if gauge_sep >= 0:
                # gauge pose is a separator: exact row/col elimination of its
                # block in the reduced system (post-psum, once, identically)
                ms = jnp.zeros((nS,), dtype).at[
                    gauge_sep * 6:(gauge_sep + 1) * 6].set(1.0)
                S_red = (S_red * (1.0 - ms)[:, None] * (1.0 - ms)[None, :]
                         + jnp.diag(ms))
                rhs_red = rhs_red * (1.0 - ms)
            d_S = -jnp.linalg.solve(S_red, rhs_red[:, None])[:, 0]
            d_I = -(x_b + X_IS @ d_S)

            # reassemble the replicated (V, 6) update: interiors are disjoint
            # across devices (psum = concatenation); separators identical on
            # every device, added once post-psum.
            upd = jnp.zeros((V, 6), dtype)
            valid = (int_ids_ >= 0)[:, None]
            upd = upd.at[jnp.clip(int_ids_, 0, V - 1)].add(
                jnp.where(valid, d_I.reshape(I_max, 6), 0.0))
            upd = lax.psum(upd, axis)
            upd = upd.at[sep_ids].add(d_S.reshape(S, 6))
            return poses @ jax.vmap(se3.vec2tran)(upd), None

        with jax.default_matmul_precision("float32"):
            poses, _ = lax.scan(gn_body, poses, None, length=iterations)
        return poses

    return body


def pose_graph_optimize_partitioned(
    poses: jnp.ndarray,
    graph: PoseGraph,
    mesh: Mesh,
    iterations: int = 10,
    damping: float = 1e-6,
    axis: str = "map",
) -> jnp.ndarray:
    """Distributed Gauss-Newton pose-graph solve over the ``axis`` mesh axis.

    Returns optimized poses (V, 4, 4), replicated on all devices.  Matches
    :func:`dicp_tpu.odometry.pose_graph_optimize` (same gauge fixing on pose
    0, same damping up to the K-fold separator-diagonal term).
    """
    K = mesh.shape[axis]
    V = poses.shape[0]
    part = partition_graph(V, np.asarray(graph.edges_i),
                           np.asarray(graph.edges_j), K)
    I_max = part.int_ids.shape[1]
    S = part.sep_ids.shape[0]
    dtype = poses.dtype

    gauge_mask = np.zeros((K, I_max), np.float64)
    if part.gauge_dev >= 0:
        gauge_mask[part.gauge_dev, part.gauge_loc] = 1.0

    t_meas_p = np.asarray(graph.t_meas)[part.e_idx]        # (K, E, 4, 4)
    info_p = np.asarray(graph.info)[part.e_idx]            # (K, E)

    body = _make_device_body(I_max, S, jnp.asarray(part.sep_ids),
                             iterations, damping, part.gauge_sep, axis)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    ))

    if jax.process_count() > 1:
        # Multi-host: committed process-local arrays cannot feed a sharding
        # that spans non-addressable devices.  The graph structure is
        # host-known and identical on every process (it must be — the
        # partition above is deterministic), so assemble global jax.Arrays
        # from the full host copy: each process materializes only the
        # shards it can address.
        def put(x, spec, dt=None):
            arr = np.asarray(x, dt)
            sh = jax.NamedSharding(mesh, spec)
            return jax.make_array_from_callback(arr.shape, sh,
                                                lambda idx: arr[idx])
    else:
        def put(x, spec, dt=None):
            return jnp.asarray(x, dt)

    return fn(put(poses, P()),
              put(t_meas_p, P(axis), dtype), put(info_p, P(axis), dtype),
              put(part.int_ids, P(axis)), put(part.eg_i, P(axis)),
              put(part.eg_j, P(axis)), put(part.loc_i, P(axis)),
              put(part.loc_j, P(axis)), put(part.e_valid, P(axis), dtype),
              put(gauge_mask, P(axis), dtype))
