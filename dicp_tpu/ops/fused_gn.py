"""Whole-solve fused Gauss-Newton ICP kernel for small pairs (VERDICT r2 #7).

The B=256 / 65-point headline solve is fusion-count-bound, not FLOP-bound:
each GN iteration of the XLA while-loop driver launches ~15-25 small fused
kernels (distance matrix, argmin, gather, weights, normal equations, solve,
retraction) at ~110 us/iteration total (BENCH.md "future perf leads";
fixed-count unrolling measured SLOWER, benchmarks/exp_headline.py).  This
kernel runs the ENTIRE iteration loop — correspondences, robust weights,
normal equations, closed-form solve, retraction, convergence bookkeeping —
as ONE Pallas program: per batch-tile, every iterate lives in VMEM/registers
and the only HBM traffic is the initial scan/map load and the final pose
store.

Semantics replicate the non-differentiable early-exit while driver
(registration._run_while + _apply_step + _gn_step, which themselves mirror
dICP/ICP.py:132-303) for the supported subset:

* icp_type pt2pt / pt2pl, dim 2 / 3, hard dense NN, all IRLS losses,
  trimming, prior weights, convergence freezing + first-crossing stats;
* histories are NOT collected (the fast path pairs with
  ``collect_histories=False``; length-1 carry-forward placeholders only);
* float32 (the TPU serving dtype).

Known deliberate deviations (both below the convergence tolerance):
distances use the difference form sum_c (x_c-y_c)^2 instead of the XLA
path's |x|^2+|y|^2-2xy expansion (different f32 roundoff near ties), and a
batch TILE exits its loop when the tile converges, while the XLA driver
iterates until the whole BATCH converges (frozen elements drift O(1e-12)
per extra no-op iteration).

Mosaic rules followed (memory: tpu-op-cost-surprises): masked iota-min
instead of argmin (tuple-reduce trap), per-coordinate broadcast FMA instead
of K=3 dot_general, scalar state as (Bt, 1, 1) lane-sliced views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dicp_tpu.config import ICPConfig

_BT = 8  # batch elements per grid step


# ---- scalar (Bt, 1, 1) linear algebra: nested-list matrices ----------------
# Mirrors ops/smallsolve (Cramer 3x3, Schur 6x6, Jacobi equilibration) on
# per-element scalars so the solve costs a fixed dag of VPU ops per tile.

def _inv3s(a):
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
    c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    adj = [[c00, c10, c20], [c01, c11, c21], [c02, c12, c22]]
    return [[adj[i][j] / det for j in range(3)] for i in range(3)]


def _mv3(m, v):
    return [sum(m[i][j] * v[j] for j in range(3)) for i in range(3)]


def _mm3(a, b):
    return [[sum(a[i][t] * b[t][j] for t in range(3)) for j in range(3)]
            for i in range(3)]


def _solve3s(a, b):
    return _mv3(_inv3s(a), b)


def _solve6s(a, b):
    p = [row[:3] for row in a[:3]]
    q = [row[3:] for row in a[:3]]
    qt = [row[:3] for row in a[3:]]
    s = [row[3:] for row in a[3:]]
    b1, b2 = b[:3], b[3:]
    p_inv = _inv3s(p)
    p_inv_q = _mm3(p_inv, q)
    m_qq = _mm3(qt, p_inv_q)
    m = [[s[i][j] - m_qq[i][j] for j in range(3)] for i in range(3)]
    p_inv_b1 = _mv3(p_inv, b1)
    qtb = _mv3(qt, p_inv_b1)
    x2 = _solve3s(m, [b2[i] - qtb[i] for i in range(3)])
    px2 = _mv3(p_inv_q, x2)
    x1 = [p_inv_b1[i] - px2[i] for i in range(3)]
    return x1 + x2


def _solve_spd_s(a, b, k):
    """ops/smallsolve.solve_spd on scalar lists (same equilibration)."""
    d = [jnp.sqrt(jnp.clip(a[i][i], 1e-30, None)) for i in range(k)]
    dinv = [1.0 / d[i] for i in range(k)]
    a_eq = [[a[i][j] * dinv[i] * dinv[j] for j in range(k)] for i in range(k)]
    b_eq = [b[i] * dinv[i] for i in range(k)]
    y = _solve3s(a_eq, b_eq) if k == 3 else _solve6s(a_eq, b_eq)
    return [y[i] * dinv[i] for i in range(k)]


def _exp_so3_s(w):
    """Rodrigues on (Bt,1,1) scalars; replicates se3.exp_so3 incl. the f32
    small-angle series switch at theta < 0.1 (se3._small)."""
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = theta2 < 0.01
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    a = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    bden = jnp.where(small, jnp.ones_like(theta2), theta2)
    b = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  (1.0 - jnp.cos(theta)) / bden)
    z = jnp.zeros_like(theta2)
    kmat = [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]
    kk = _mm3(kmat, kmat)
    eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    return [[eye[i][j] + a * kmat[i][j] + b * kk[i][j] for j in range(3)]
            for i in range(3)]


def _loss_w(name, le2, metric, differentiable, steep):
    """losses.robust_weight on precomputed |loss_err|^2 (Bt, n, 1)."""
    m2 = metric * metric
    if name is None:
        return jnp.ones_like(le2)
    if name == "huber":
        if differentiable:
            return m2 / (m2 + le2)
        en = _safe_sqrt(le2)
        return jnp.where(en > metric, metric / jnp.where(en == 0.0, 1.0, en),
                         jnp.ones_like(en))
    if name == "cauchy":
        return 1.0 / (1.0 + le2 / m2)
    if name == "welsch":
        return jnp.exp(-le2 / m2)
    if name == "gm":
        d = m2 + le2
        return (m2 / d) ** 2
    if name == "trim":
        return _trim_w(le2, metric, differentiable, steep)
    raise ValueError(name)


def _safe_sqrt(sq):
    """losses._err_norm on |e|^2: exact 0 at 0 (no NaN subgradients)."""
    zero = sq == 0.0
    return jnp.where(zero, jnp.zeros_like(sq),
                     jnp.sqrt(jnp.where(zero, jnp.ones_like(sq), sq)))


def _trim_w(en2, metric, differentiable, steep):
    en = _safe_sqrt(en2)
    if differentiable:
        return 0.5 * jnp.tanh(steep * (metric - en) - 3.0) + 0.5
    return jnp.where(en < metric, jnp.ones_like(en), jnp.zeros_like(en))


def _make_kernel(cfg: ICPConfig, bt: int, n: int, m: int):
    import numpy as np

    k = 3 if cfg.dim == 2 else 6
    tcols = 6 if cfg.icp_type == "pt2pl" else 3
    T = cfg.max_iterations
    f32 = np.float32  # np scalars: jnp scalars are Arrays = captured consts
    tol = f32(cfg.tolerance)
    thresh = f32(cfg.match_ratio_thresh)
    pt2pl = cfg.icp_type == "pt2pl"

    def kernel(src_ref, tgtT_ref, w0_ref, C0_ref, r0_ref,
               C_o, r_o, conv_o, iters_o, ratio_o, wsave_o, cost_o,
               winit_s, wraw_s, flag_s):
        zero_s = jnp.zeros((bt, 1, 1), f32)
        C_o[...] = C0_ref[...]
        r_o[...] = r0_ref[...]
        conv_o[...] = zero_s
        iters_o[...] = zero_s
        ratio_o[...] = zero_s
        wsave_o[...] = jnp.zeros((bt, n, 1), f32)
        cost_o[...] = zero_s
        winit_s[...] = w0_ref[...]
        wraw_s[...] = jnp.zeros((bt, n, 1), f32)
        flag_s[0] = 0
        flag_s[1] = 0

        def body(it, carry):
            @pl.when(flag_s[0] == 0)
            def _():
                src = src_ref[...]                       # (bt, n, 3)
                sx = [src[:, :, c:c + 1] for c in range(3)]
                tg = [tgtT_ref[:, c:c + 1, :] for c in range(tcols)]
                Cf = C_o[...]                            # (bt, 1, 9)
                Cs = [[Cf[:, :, 3 * i + j:3 * i + j + 1] for j in range(3)]
                      for i in range(3)]
                rf = r_o[...]
                rv = [rf[:, :, c:c + 1] for c in range(3)]
                w0v = winit_s[...]                       # (bt, n, 1)

                # transform + distances (dICP/ICP.py:137; difference form)
                cp = [sx[0] * Cs[c][0] + sx[1] * Cs[c][1] + sx[2] * Cs[c][2]
                      for c in range(3)]
                ps = [cp[c] + rv[c] for c in range(3)]
                diff0 = ps[0] - tg[0]
                d2 = diff0 * diff0
                for c in (1, 2):
                    diff = ps[c] - tg[c]
                    d2 = d2 + diff * diff                # (bt, n, m)

                # hard 1-NN: masked iota-min, first-min tie rule like argmin
                colM = lax.broadcasted_iota(jnp.int32, (bt, n, m), 2)
                lmin = jnp.min(d2, axis=2, keepdims=True)
                larg = jnp.min(jnp.where(d2 == lmin, colM, jnp.int32(2 ** 30)),
                               axis=2, keepdims=True)    # (bt, n, 1)
                onehot = colM == larg
                nn = [jnp.sum(jnp.where(onehot, tg[c], 0.0),
                              axis=2, keepdims=True) for c in range(tcols)]

                e = [ps[c] - nn[c] for c in range(3)]
                en2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]

                # robust weights (dICP/ICP.py:152-169)
                if cfg.trim_dist is not None:
                    trim = _trim_w(en2, f32(cfg.trim_dist), cfg.differentiable,
                                   f32(cfg.tanh_steepness))
                else:
                    trim = jnp.ones_like(en2)
                if pt2pl:
                    nrm = nn[3:6]
                    res = e[0] * nrm[0] + e[1] * nrm[1] + e[2] * nrm[2]
                    le2 = res * res
                else:
                    le2 = en2
                lw = _loss_w(cfg.loss_name, le2, f32(cfg.loss_metric),
                             cfg.differentiable, f32(cfg.tanh_steepness))
                w = w0v * trim * lw                      # (bt, n, 1) per point
                w_sqrt = jnp.sqrt(w + 1.0e-10) - 1.0e-5  # dICP/ICP.py:194
                ws2 = w_sqrt * w_sqrt

                # Jacobian columns -> normal equations (dICP/ICP.py:171-201)
                if pt2pl:
                    nxc = [nrm[1] * cp[2] - nrm[2] * cp[1],
                           nrm[2] * cp[0] - nrm[0] * cp[2],
                           nrm[0] * cp[1] - nrm[1] * cp[0]]
                    J6 = nxc + [-nrm[0], -nrm[1], -nrm[2]]
                    Jc = [J6[2:5] if cfg.dim == 2 else J6]  # one "component"
                    rs = [res]
                    cost_pt = ws2 * le2
                else:
                    # per-component rows of [skew(cp) | -I]
                    z = jnp.zeros_like(cp[0])
                    one = jnp.ones_like(cp[0])
                    rows6 = [
                        [z, -cp[2], cp[1], -one, z, z],
                        [cp[2], z, -cp[0], z, -one, z],
                        [-cp[1], cp[0], z, z, z, -one],
                    ]
                    if cfg.dim == 2:
                        rows6 = [r_[2:5] for r_ in rows6]
                    Jc = rows6
                    rs = e
                    cost_pt = ws2 * en2

                A = [[None] * k for _ in range(k)]
                b = [None] * k
                for i in range(k):
                    for j in range(i, k):
                        acc = sum(Jc[c][i] * Jc[c][j] for c in range(len(Jc)))
                        A[i][j] = jnp.sum(ws2 * acc, axis=1, keepdims=True)
                        A[j][i] = A[i][j]
                    bacc = sum(Jc[c][i] * rs[c] for c in range(len(Jc)))
                    b[i] = jnp.sum(ws2 * bacc, axis=1, keepdims=True)
                cost = jnp.sum(cost_pt, axis=1, keepdims=True)  # (bt, 1, 1)

                # damping (registration._damping: relative LM unless pinned)
                if cfg.tikhonov is not None:
                    lam = f32(cfg.tikhonov)
                else:
                    dmax = A[0][0]
                    for i in range(1, k):
                        dmax = jnp.maximum(dmax, A[i][i])
                    lam = 1e-6 * jnp.maximum(dmax, 1.0)
                for i in range(k):
                    A[i][i] = A[i][i] + lam

                delta = _solve_spd_s(A, b, k)
                delta = [-d_ for d_ in delta]
                if cfg.dim == 2:
                    zs = jnp.zeros_like(delta[0])
                    d6 = [zs, zs, delta[0], delta[1], delta[2], zs]
                else:
                    d6 = delta
                dn2 = sum(d_ * d_ for d_ in delta)
                delta_norm = jnp.sqrt(dn2)

                # retraction C <- exp(w^)^T C, r <- r - rho (dICP/ICP.py:210-217)
                dC = _exp_so3_s(d6[:3])
                Cn = [[sum(dC[t][i] * Cs[t][j] for t in range(3))
                       for j in range(3)] for i in range(3)]
                for i in range(3):
                    for j in range(3):
                        C_o[:, :, 3 * i + j:3 * i + j + 1] = Cn[i][j]
                for c in range(3):
                    r_o[:, :, c:c + 1] = rv[c] - d6[3 + c]

                # bookkeeping (registration._apply_step, dICP/ICP.py:220-257)
                wraw_s[...] = w
                sum_w = jnp.sum(w, axis=1, keepdims=True)
                wsave_o[...] = jnp.where(sum_w == 0.0, wsave_o[...], w)
                cost_o[...] = jnp.where(cost == 0.0, cost_o[...], cost)

                below = delta_norm < tol                 # (bt, 1, 1) bool
                conv = jnp.maximum(conv_o[...], below.astype(f32))
                conv_o[...] = conv
                itf = (it + 1).astype(f32)
                iters = iters_o[...]
                iters_o[...] = jnp.where(
                    below, iters + itf * (iters == 0.0), iters)
                num_curr = jnp.sum((w > thresh).astype(f32),
                                   axis=1, keepdims=True)
                num_start = jnp.sum((w0v > thresh).astype(f32),
                                    axis=1, keepdims=True)
                num_start = jnp.where(num_start == 0.0,
                                      jnp.ones_like(num_start), num_start)
                ratio = num_curr / num_start
                mr = ratio_o[...]
                ratio_o[...] = jnp.where(
                    below, mr + ratio * (mr == 0.0), mr)
                winit_s[...] = w0v * jnp.where(below, 0.0, 1.0)

                flag_s[0] = (jnp.sum(conv) == f32(bt)).astype(jnp.int32)
                flag_s[1] = it + 1
            return carry

        lax.fori_loop(0, T, body, 0)

        # post-loop stats fill (registration._finalize, dICP/ICP.py:262-271)
        itf = flag_s[1].astype(f32)
        iters = iters_o[...]
        iters_o[...] = jnp.where(iters == 0.0, itf, iters)
        nc_ = jnp.sum((wraw_s[...] > thresh).astype(f32), axis=1, keepdims=True)
        ns_ = jnp.sum((winit_s[...] > thresh).astype(f32), axis=1, keepdims=True)
        ns_ = jnp.where(ns_ == 0.0, jnp.ones_like(ns_), ns_)
        mr = ratio_o[...]
        ratio_o[...] = jnp.where(mr == 0.0, nc_ / ns_, mr)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "bt"))
def fused_gn_solve(source, target, weight, C0, r0, cfg: ICPConfig,
                   interpret: bool = False, bt: int = _BT):
    """Run the full while-driver ICP solve in one Pallas program.

    Inputs are the PREPROCESSED solver tensors (registration._preprocess):
    source (B, n, 3) f32, target (B, m, 3|6) f32, weight (B, n) per-POINT
    (pt2pt weights un-expanded), C0 (B, 3, 3), r0 (B, 3).

    Returns (C (B,3,3), r (B,3), converged (B,) bool, num_iters (B,),
    match_ratio (B,), prev_w_save (B, n), prev_cost (B,)) with the
    while-driver's exact bookkeeping semantics (histories-off).
    """
    B, n, _ = source.shape
    m = target.shape[1]
    tcols = 6 if cfg.icp_type == "pt2pl" else 3
    bt = min(bt, B)
    Bp = -(-B // bt) * bt

    def pad(a):
        if Bp == B:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], Bp - B, axis=0)], axis=0)

    f32 = jnp.float32
    srcp = pad(source.astype(f32))
    tgtT = pad(jnp.swapaxes(target[..., :tcols].astype(f32), 1, 2))
    w0 = pad(weight.astype(f32))[..., None]              # (Bp, n, 1)
    C0v = pad(C0.astype(f32)).reshape(Bp, 1, 9)
    r0v = pad(r0.astype(f32)).reshape(Bp, 1, 3)

    grid = (Bp // bt,)
    bi = lambda i: (i, 0, 0)
    out_shapes = [
        jax.ShapeDtypeStruct((Bp, 1, 9), f32),   # C
        jax.ShapeDtypeStruct((Bp, 1, 3), f32),   # r
        jax.ShapeDtypeStruct((Bp, 1, 1), f32),   # converged
        jax.ShapeDtypeStruct((Bp, 1, 1), f32),   # num_iters
        jax.ShapeDtypeStruct((Bp, 1, 1), f32),   # match_ratio
        jax.ShapeDtypeStruct((Bp, n, 1), f32),   # prev_w_save
        jax.ShapeDtypeStruct((Bp, 1, 1), f32),   # prev_cost
    ]
    out_specs = [
        pl.BlockSpec((bt, 1, 9), bi), pl.BlockSpec((bt, 1, 3), bi),
        pl.BlockSpec((bt, 1, 1), bi), pl.BlockSpec((bt, 1, 1), bi),
        pl.BlockSpec((bt, 1, 1), bi), pl.BlockSpec((bt, n, 1), bi),
        pl.BlockSpec((bt, 1, 1), bi),
    ]
    in_specs = [
        pl.BlockSpec((bt, n, 3), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, tcols, m), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, n, 1), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 1, 9), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 1, 3), bi, memory_space=pltpu.VMEM),
    ]
    T = cfg.max_iterations
    Cv, rv, conv, iters, ratio, wsave, cost = pl.pallas_call(
        _make_kernel(cfg, bt, n, m),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bt, n, 1), f32),     # w_init (freezing state)
            pltpu.VMEM((bt, n, 1), f32),     # w_raw
            pltpu.SMEM((2,), jnp.int32),     # (done, it_final)
        ],
        cost_estimate=pl.CostEstimate(
            flops=Bp * T * n * (m * 8 + 220),
            bytes_accessed=(Bp // bt) * T * bt * (n * 3 + tcols * m + n) * 4,
            transcendentals=Bp * T * (n + 8)),
        interpret=interpret,
    )(srcp, tgtT, w0, C0v, r0v)
    dtype = source.dtype
    return (Cv[:B].reshape(B, 3, 3).astype(dtype),
            rv[:B].reshape(B, 3).astype(dtype),
            conv[:B, 0, 0] > 0.0,
            iters[:B, 0, 0].astype(dtype),
            ratio[:B, 0, 0].astype(dtype),
            wsave[:B, :, 0].astype(dtype),
            cost[:B, 0, 0].astype(dtype))


def fused_eligible(cfg: ICPConfig, source, target, key) -> bool:
    """Static (trace-time) gate for the fused whole-solve kernel.

    Auto (``cfg.fused_small is None``): TPU backends only, and only in the
    configuration whose semantics the kernel replicates exactly — the
    non-differentiable early-exit while driver with histories off, hard
    dense NN, pt2pt/pt2pl.  ``True`` forces it (interpret mode off-TPU, for
    tests); ``False`` disables.
    """
    if cfg.fused_small is False:
        return False
    n, m = source.shape[-2], target.shape[-2]
    ok = (
        cfg.resolved_driver() == "while"
        and not cfg.collect_histories
        and not cfg.const_iter
        and cfg.icp_type in ("pt2pt", "pt2pl")
        and key is None
        and source.dtype == jnp.float32
        and n <= 256 and m <= 512
        and cfg.resolved_nn_method(n, m, jax.default_backend() == "cpu") == "dense"
    )
    if cfg.fused_small is None:
        # Auto is OFF permanently: the on-chip A/B (exp_fused_gn.py,
        # 2026-08-19) measured the fused kernel SLOWER than the XLA while
        # driver (forward 1.89 vs 0.76 ms, IFT fwd+bwd 2.50 vs 1.58 ms at
        # B=256) — the Mosaic loop serializes work XLA overlaps, so the
        # dispatch savings never materialize.  See config.fused_small.
        return False
    return ok
