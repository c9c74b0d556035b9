"""Generalized-ICP (plane-to-plane) — distribution-to-distribution alignment.

No reference counterpart (the reference offers pt2pt/pt2pl only,
dICP/ICP.py:49); GICP (Segal, Haehnel, Thrun, RSS 2009) is the remaining
classical ICP family member: every point carries a covariance describing
its local surface, and the residual is weighted by the inverse of the
combined covariance

    Sigma_i = C_target_i + R C_source_i R^T,   cost_i = r_i^T Sigma_i^{-1} r_i.

With the paper's (1, 1, eps) plane-to-plane regularization each covariance
is closed-form in the surface normal alone:

    C = U diag(1, 1, eps) U^T = I + (eps - 1) n n^T,

so no per-point eigendecomposition is stored or differentiated through —
the repo's normal estimation (ops/normals, power-iteration, no
jnp.linalg.eigh which lowers to a ~29 ms iterative kernel on TPU) provides
everything, and Sigma_i is a rank-2 update of 2I inverted by the
closed-form 3x3 adjugate (ops/smallsolve.inv3) on the VPU.

TPU-first structure mirrors dicp_tpu.registration: one jitted program,
`lax.while_loop` early exit for inference / fixed-trip `lax.scan` with
convergence freezing for reverse-mode AD, f32 matmul precision pinned,
batch via vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dicp_tpu import se3
from dicp_tpu.ops.normals import estimate_normals
from dicp_tpu.ops.smallsolve import inv3, solve6_spd


class GICPResult(NamedTuple):
    T: jnp.ndarray            # (N, 4, 4) source -> target
    iterations: jnp.ndarray   # (N,) float
    converged: jnp.ndarray    # (N,) bool
    cost: jnp.ndarray         # (N,) final mean Mahalanobis cost


def _skew_batch(v):
    """(n, 3) -> (n, 3, 3)."""
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([z, -v[:, 2], v[:, 1]], -1),
        jnp.stack([v[:, 2], z, -v[:, 0]], -1),
        jnp.stack([-v[:, 1], v[:, 0], z], -1),
    ], -2)


def _gicp_step(T, src, src_n, tgt, tgt_n, weight, epsilon, trim2):
    """One GN step: correspondences -> Mahalanobis normal equations -> se(3)
    update.  Returns (T_new, step_norm, mean_cost)."""
    R, t = T[:3, :3], T[:3, 3]
    p = src @ R.T + t                                   # (n, 3)

    # hard NN (gradient flows into the gathered rows, matching the repo's
    # hard-diff semantics, knn.py:68)
    d2 = (jnp.sum(p * p, 1)[:, None] + jnp.sum(tgt * tgt, 1)[None, :]
          - 2.0 * p @ tgt.T)
    idx = jnp.argmin(d2, axis=1)
    q = tgt[idx]                                        # (n, 3)
    nt = tgt_n[idx]                                     # (n, 3)

    r = p - q                                           # (n, 3)
    ns_w = src_n @ R.T                                  # rotated source normals
    # Sigma = C_t + R C_s R^T = 2 I + (eps-1)(nt nt^T + m m^T)
    eye = jnp.eye(3, dtype=src.dtype)
    Sigma = (2.0 * eye + (epsilon - 1.0)
             * (nt[:, :, None] * nt[:, None, :]
                + ns_w[:, :, None] * ns_w[:, None, :]))
    M = inv3(Sigma)                                     # (n, 3, 3) SPD

    w = weight * (jnp.sum(r * r, 1) < trim2).astype(src.dtype)

    # J_i = [ I | -skew(p_i) ]  (n, 3, 6)
    J = jnp.concatenate(
        [jnp.broadcast_to(eye, (src.shape[0], 3, 3)), -_skew_batch(p)], -1)
    MJ = jnp.einsum("nij,njk->nik", M, J)
    H = jnp.einsum("nij,n,nik->jk", J, w, MJ)           # (6, 6)
    Mr = jnp.einsum("nij,nj->ni", M, r)
    g = jnp.einsum("nij,n,ni->j", J, w, Mr)             # (6,)

    wsum = jnp.maximum(jnp.sum(w), 1e-10)
    # Levenberg jitter scaled to H's diagonal: keeps the solve defined when
    # every correspondence is trimmed or the scene is degenerate
    lam = 1e-9 * jnp.trace(H) / 6.0 + 1e-30
    delta = solve6_spd(H + lam * jnp.eye(6, dtype=src.dtype), -g)
    T_new = se3.vec2tran(delta) @ T
    cost = jnp.sum(w * jnp.sum(r * Mr, 1)) / wsum
    return T_new, jnp.linalg.norm(delta), cost


def _solve_one(src, tgt, tgt_n, src_n, T0, weight, *, epsilon, trim2,
               max_iterations, tolerance, differentiable):
    step = partial(_gicp_step, src=src, src_n=src_n, tgt=tgt, tgt_n=tgt_n,
                   weight=weight, epsilon=epsilon, trim2=trim2)

    if not differentiable:
        def cond(c):
            T, it, done, cost = c
            return jnp.logical_and(it < max_iterations,
                                   jnp.logical_not(done))

        def body(c):
            T, it, done, _ = c
            T_new, dn, cost = step(T)
            return T_new, it + 1.0, dn < tolerance, cost

        T, it, done, cost = lax.while_loop(
            cond, body,
            (T0, jnp.asarray(0.0, src.dtype),
             jnp.asarray(False), jnp.asarray(jnp.inf, src.dtype)))
        return T, it, done, cost

    def body(c, _):
        T, it, done, cost = c
        T_new, dn, cost_new = step(T)
        # convergence freezing: a converged element's pose is carried
        # forward bit-identically (registration.py batch==serial contract)
        T_out = jnp.where(done, T, T_new)
        cost_out = jnp.where(done, cost, cost_new)
        it_out = jnp.where(done, it, it + 1.0)
        done_out = jnp.logical_or(done, dn < tolerance)
        return (T_out, it_out, done_out, cost_out), ()

    (T, it, done, cost), _ = lax.scan(
        body,
        (T0, jnp.asarray(0.0, src.dtype), jnp.asarray(False),
         jnp.asarray(jnp.inf, src.dtype)),
        None, length=max_iterations)
    return T, it, done, cost


def register_gicp(
    source: jnp.ndarray,
    target: jnp.ndarray,
    T_init: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    *,
    source_normals: Optional[jnp.ndarray] = None,
    epsilon: float = 1e-3,
    trim_dist: Optional[float] = None,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    differentiable: bool = False,
    k_normals: int = 16,
) -> GICPResult:
    """Batched plane-to-plane GICP: (N, n, 3), (N, m, 3|6), (N, 4, 4).

    ``target`` columns 3:6 are used as target normals when present,
    otherwise normals for BOTH clouds are estimated in-program
    (ops/normals, k=``k_normals``).  ``source_normals`` (N, n, 3) skips the
    source-side estimate.  ``epsilon`` is the plane-to-plane covariance
    regularizer (Segal et al. use 1e-3; ``epsilon=1`` degrades exactly to
    isotropic covariances, i.e. point-to-point GN).  ``differentiable``
    selects the fixed-trip scan driver (reverse-mode AD; hard-NN gradient
    semantics) instead of the early-exit while loop.

    Correspondences use the dense (n, m) distance matrix — GICP is for
    the mid-scale regime; pair it with :mod:`dicp_tpu.multiscale` /
    ops.voxel for large clouds.
    """
    if source.ndim != 3 or target.ndim != 3 or T_init.ndim != 3:
        raise ValueError("register_gicp expects batched (N, n, 3), "
                         "(N, m, 3|6), (N, 4, 4)")
    dt = source.dtype
    src = source[..., :3]
    tgt = target[..., :3]
    with jax.default_matmul_precision("float32"):
        if target.shape[-1] >= 6:
            tgt_n = target[..., 3:6]
        else:
            tgt_n = estimate_normals(tgt, k=k_normals)
        if source_normals is None:
            src_n = estimate_normals(src, k=k_normals)
        else:
            src_n = source_normals[..., :3]
        if weight is None:
            weight = jnp.ones(src.shape[:-1], dt)
        trim2 = (jnp.asarray(jnp.inf, dt) if trim_dist is None
                 else jnp.asarray(float(trim_dist) ** 2, dt))

        solve = partial(_solve_one, epsilon=float(epsilon), trim2=trim2,
                        max_iterations=max_iterations, tolerance=tolerance,
                        differentiable=differentiable)
        T, it, done, cost = jax.vmap(solve)(src, tgt, tgt_n, src_n,
                                            T_init.astype(dt), weight)
    return GICPResult(T=T, iterations=it, converged=done, cost=cost)


register_gicp_jit = jax.jit(
    register_gicp,
    static_argnames=("epsilon", "trim_dist", "max_iterations", "tolerance",
                     "differentiable", "k_normals"))
