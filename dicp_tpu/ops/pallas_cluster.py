"""Pallas kernels for the cluster-index block search (TPU fast path).

Two generations:

* :func:`block_search_pallas` (v1, kept for comparison): grid=(nb,), the
  kernel itself DMAs each (3, g) group slab from HBM with double buffering.
  Measured 15.6 ms vs the XLA path's 12.1 ms at 100k — the nb*P ~ 25k tiny
  1.5 KB slab DMAs are latency-bound (BENCH.md r2).
* :func:`fused_search_pallas` (v2, the production path): the slab gather is
  done ONCE by XLA as a single large batched gather (slab DMAs batched
  across all blocks — tens of MB at HBM bandwidth instead of 25k latency-
  bound copies), then one grid=(nb,) kernel runs entirely out of VMEM,
  fusing the (Qs, P*g) candidate distances + running argmin WITH the
  per-query certification bound over all G groups (previously a separate
  XLA pass over an (nb, Qs, G) tile).  Mosaic's automatic block pipelining
  double-buffers the pre-gathered candidate blocks.

Exactly the arithmetic of the XLA path (diff-form distances, strict '<'
keeps the earlier candidate on ties) — parity is asserted in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(P: int, g: int, Qb: int):
    def kernel(bsel_ref, x_ref, pts_hbm, best_out, row_out, ybuf, sem):
        i = pl.program_id(0)

        def get_dma(slot, j):
            grp = bsel_ref[i * P + j]
            return pltpu.make_async_copy(pts_hbm.at[grp], ybuf.at[slot],
                                         sem.at[slot])

        get_dma(0, 0).start()
        x = x_ref[0]                                        # (Qb, 3)

        def body(j, carry):
            best, brow = carry
            slot = j % 2

            @pl.when(j + 1 < P)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            y = ybuf[slot]                                  # (3, g) transposed
            d2 = jnp.zeros((Qb, g), jnp.float32)
            for c in range(3):
                diff = x[:, c][:, None] - y[c][None, :]
                d2 = d2 + diff * diff
            lmin = jnp.min(d2, axis=1, keepdims=True)       # (Qb, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            larg = jnp.min(jnp.where(d2 == lmin, col, jnp.int32(2**30)),
                           axis=1, keepdims=True)
            grow = larg + bsel_ref[i * P + j] * g
            better = lmin < best
            best = jnp.where(better, lmin, best)
            brow = jnp.where(better, grow, brow)
            return best, brow

        best0 = jnp.full((Qb, 1), jnp.inf, jnp.float32)
        row0 = jnp.zeros((Qb, 1), jnp.int32)
        best, brow = lax.fori_loop(0, P, body, (best0, row0))
        best_out[0, 0] = best[:, 0]
        row_out[0, 0] = brow[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_search_pallas(points: jnp.ndarray, xb: jnp.ndarray,
                        bsel: jnp.ndarray, interpret: bool = False):
    """(G, g, 3) grouped points x (nb, Qb, 3) query blocks x (nb, P) group
    selections -> (best d2 (nb, Qb) f32, candidate row (nb, Qb) int32).

    Row indexes the SORTED cloud (group*g + offset), as in the XLA path.
    """
    G, g, _ = points.shape
    nb, Qb, _ = xb.shape
    P = bsel.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, Qb, 3), lambda i, bsel_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # outputs are (nb, 1, Qb): Mosaic requires the last two block dims
        # to divide (8, 128) or equal the array dims — (1, Qb) blocks of a
        # (nb, Qb) array violate that; the singleton middle axis satisfies it
        out_specs=[
            pl.BlockSpec((1, 1, Qb), lambda i, bsel_ref: (i, 0, 0)),
            pl.BlockSpec((1, 1, Qb), lambda i, bsel_ref: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    best, row = pl.pallas_call(
        _make_kernel(P, g, Qb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, Qb), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, Qb), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * nb * Qb * P * g,
            bytes_accessed=(nb * Qb * 3 + nb * P * g * 3 + 2 * nb * Qb) * 4,
            transcendentals=0),
        interpret=interpret,
    )(bsel.reshape(-1).astype(jnp.int32), xb.astype(jnp.float32),
      jnp.swapaxes(points.astype(jnp.float32), 1, 2))
    return best[:, 0, :], row[:, 0, :]


def _make_fused_kernel(P: int, g: int, Qs: int, Gp: int, eps8: float,
                       CH: int, ncol: int):
    def kernel(bsel_ref, x_ref, candT_ref, centT_ref, rad_ref,
               best_out, col_out, bound_out):
        i = pl.program_id(0)
        x = x_ref[0]                                       # (Qs, 3)
        # queries stay (Qs, 3): x[:, c][:, None] is sublane-oriented, so the
        # broadcast against lane-oriented candidate rows is free.  A (3, Qs)
        # layout measured 4x slower — every xq[c][:, None] forced a
        # lane->sublane relayout per group per coordinate.

        # ---- phase 1: running argmin over the pre-gathered candidates in
        # WIDE (Qs, CH) chunks.  The kernel tracks the winning candidate
        # COLUMN only; the column -> sorted-cloud-row mapping is a trivial
        # XLA gather afterwards.  (Per-GROUP (Qs, g=128) tiles measured
        # 14.4 ms — 25k tiny loop iterations; CH=512 quarters them.)
        def body(j, carry):
            best, bcol = carry
            y = candT_ref[0, :, pl.ds(j * CH, CH)]          # (3, CH)
            d2 = jnp.zeros((Qs, CH), jnp.float32)
            for c in range(3):
                diff = x[:, c][:, None] - y[c][None, :]
                d2 = d2 + diff * diff
            lmin = jnp.min(d2, axis=1, keepdims=True)       # (Qs, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (Qs, CH), 1)
            larg = jnp.min(jnp.where(d2 == lmin, col, jnp.int32(2 ** 30)),
                           axis=1, keepdims=True) + j * CH
            better = lmin < best                            # strict '<': the
            best = jnp.where(better, lmin, best)            # earlier chunk
            bcol = jnp.where(better, larg, bcol)            # wins ties
            return best, bcol

        best0 = jnp.full((Qs, 1), jnp.inf, jnp.float32)
        col0 = jnp.zeros((Qs, 1), jnp.int32)
        best, brow = lax.fori_loop(0, ncol, body, (best0, col0))

        # ---- phase 2: certification bound = min lower bound over all
        # NON-selected groups (cluster_knn._query_bounds, fused in)
        dc2 = jnp.zeros((Qs, Gp), jnp.float32)
        for c in range(3):
            diff = x[:, c][:, None] - centT_ref[c][None, :]
            dc2 = dc2 + diff * diff
        dc = jnp.sqrt(dc2)
        lb = jnp.maximum(dc * (1.0 - eps8) - rad_ref[0][None, :], 0.0) ** 2

        # Exclude selected groups via an additive +inf penalty (an f32
        # carry: a bool (1, Gp) fori_loop carry trips a Mosaic i1-vector
        # layout bug).  inf+inf=inf, never NaN; duplicate selections fine.
        def mask_body(j, pen):
            colG = jax.lax.broadcasted_iota(jnp.int32, (1, Gp), 1)
            return pen + jnp.where(colG == bsel_ref[i * P + j],
                                   jnp.float32(jnp.inf), jnp.float32(0.0))

        pen = lax.fori_loop(0, P, mask_body, jnp.zeros((1, Gp), jnp.float32))
        bound = jnp.min(lb + pen, axis=1, keepdims=True)    # (Qs, 1)

        best_out[0, 0] = best[:, 0]
        col_out[0, 0] = brow[:, 0]
        bound_out[0, 0] = bound[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_search_pallas(points, centers, radius, xb, bsel,
                        interpret: bool = False):
    """v2 fused block search + certification.

    (G, g, 3) grouped points / (G, 3) centers / (G,) radii x (nb, Qs, 3)
    query blocks x (nb, P) group selections ->
    (best d2 (nb, Qs) f32, sorted-cloud row (nb, Qs) i32, bound (nb, Qs) f32).

    The candidate gather runs as ONE XLA batched gather (the v1 kernel's
    25k latency-bound in-kernel slab DMAs, batched); the kernel streams
    pre-gathered (3, P*g) blocks through VMEM via Mosaic's pipeline.
    f32 arithmetic; bounds keep the few-ulp conservative slack so the
    certificate can under-claim but never lie.
    """
    G, g, _ = points.shape
    nb, Qs, _ = xb.shape
    P = bsel.shape[1]
    Gp = -(-G // 128) * 128

    # wide candidate chunks for phase 1; pad the candidate row to a chunk
    # multiple with far-sentinel columns (never win an argmin).  Measured at
    # 100k (f128p32): CH=512 -> 6.83 ms, CH=2048 -> 6.97 ms; per-GROUP
    # (CH=g=128) tiles -> 14.4 ms (loop-overhead-bound).
    CH = min(512, P * g)
    ncol = -(-(P * g) // CH)
    padC = ncol * CH - P * g

    cand = points.astype(jnp.float32)[bsel]                  # (nb, P, g, 3)
    candT = jnp.transpose(cand, (0, 3, 1, 2)).reshape(nb, 3, P * g)
    if padC:
        candT = jnp.concatenate(
            [candT, jnp.full((nb, 3, padC), 1.0e15, jnp.float32)], axis=2)
    centT = jnp.swapaxes(centers.astype(jnp.float32), 0, 1)  # (3, G)
    padG = Gp - G
    if padG:
        # sentinel centers: huge lb, never the binding bound
        centT = jnp.concatenate(
            [centT, jnp.full((3, padG), 1.0e15, jnp.float32)], axis=1)
        radp = jnp.concatenate(
            [radius.astype(jnp.float32), jnp.zeros((padG,), jnp.float32)])
    else:
        radp = radius.astype(jnp.float32)

    eps8 = float(8.0 * jnp.finfo(jnp.float32).eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, Qs, 3), lambda i, bs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ncol * CH), lambda i, bs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Gp), lambda i, bs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda i, bs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Qs), lambda i, bs: (i, 0, 0)),
            pl.BlockSpec((1, 1, Qs), lambda i, bs: (i, 0, 0)),
            pl.BlockSpec((1, 1, Qs), lambda i, bs: (i, 0, 0)),
        ],
    )
    best, bcol, bound = pl.pallas_call(
        _make_fused_kernel(P, g, Qs, Gp, eps8, CH, ncol),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, Qs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, Qs), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, Qs), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nb * Qs * (8 * P * g + 10 * Gp),
            bytes_accessed=(nb * (3 * Qs + 3 * P * g + 3 * Qs)
                            + 4 * Gp) * 4,
            transcendentals=nb * Qs * Gp),
        interpret=interpret,
    )(bsel.reshape(-1).astype(jnp.int32), xb.astype(jnp.float32), candT,
      centT, radp[None, :])
    # winning candidate column -> sorted-cloud row (tiny XLA gather; the
    # candidate order (group, offset) matches the XLA path's tie rule)
    rowbase = (bsel[:, :, None].astype(jnp.int32) * g
               + jnp.arange(g, dtype=jnp.int32)[None, None, :]
               ).reshape(nb, P * g)
    row = jnp.take_along_axis(rowbase, bcol[:, 0, :], axis=1)
    return best[:, 0, :], row, bound[:, 0, :]


def _make_topk_kernel(P: int, g: int, Qs: int, Gp: int, eps8: float,
                      CH: int, ncol: int, k: int):
    L = ncol * CH

    def kernel(bsel_ref, x_ref, candT_ref, centT_ref, rad_ref,
               best_out, col_out, bound_out, d2_scr):
        i = pl.program_id(0)
        x = x_ref[0]                                       # (Qs, 3)

        # ---- phase 1: materialize the block's full (Qs, L) candidate d2
        # tile in VMEM scratch.  This is what makes k-extraction cheap: the
        # XLA _topk_small path re-reads the HBM-resident candidate matrix k
        # times (16 passes over 1.2 GB = 78 ms at 100k); here every pass is
        # a VPU sweep over VMEM.
        def fill(j, _):
            y = candT_ref[0, :, pl.ds(j * CH, CH)]          # (3, CH)
            d2 = jnp.zeros((Qs, CH), jnp.float32)
            for c in range(3):
                diff = x[:, c][:, None] - y[c][None, :]
                d2 = d2 + diff * diff
            d2_scr[:, pl.ds(j * CH, CH)] = d2
            return 0

        lax.fori_loop(0, ncol, fill, 0)

        # ---- phase 2: k iterative-argmin extraction passes (k static ->
        # unrolled).  Masked iota-min, not argmin (Mosaic tuple-reduce trap);
        # masking ONLY the winning column keeps duplicate distances for
        # later ranks — exactly cluster_knn._topk_small's rule.
        colL = jax.lax.broadcasted_iota(jnp.int32, (Qs, L), 1)
        for j in range(k):
            d2 = d2_scr[:, :]
            lmin = jnp.min(d2, axis=1, keepdims=True)       # (Qs, 1)
            larg = jnp.min(jnp.where(d2 == lmin, colL, jnp.int32(2 ** 30)),
                           axis=1, keepdims=True)
            best_out[0, j] = lmin[:, 0]
            col_out[0, j] = larg[:, 0]
            if j + 1 < k:
                d2_scr[:, :] = jnp.where(colL == larg, jnp.float32(jnp.inf),
                                         d2)

        # ---- phase 3: certification bound over non-selected groups
        # (identical to the 1-NN kernel; certified iff the k-th distance
        # beats it)
        dc2 = jnp.zeros((Qs, Gp), jnp.float32)
        for c in range(3):
            diff = x[:, c][:, None] - centT_ref[c][None, :]
            dc2 = dc2 + diff * diff
        dc = jnp.sqrt(dc2)
        lb = jnp.maximum(dc * (1.0 - eps8) - rad_ref[0][None, :], 0.0) ** 2

        def mask_body(j, pen):
            colG = jax.lax.broadcasted_iota(jnp.int32, (1, Gp), 1)
            return pen + jnp.where(colG == bsel_ref[i * P + j],
                                   jnp.float32(jnp.inf), jnp.float32(0.0))

        pen = lax.fori_loop(0, P, mask_body, jnp.zeros((1, Gp), jnp.float32))
        bound_out[0, 0] = jnp.min(lb + pen, axis=1, keepdims=True)[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_topk_pallas(points, centers, radius, xb, bsel, k: int,
                      interpret: bool = False):
    """Fused exact k-NN block search (VERDICT r2 #4).

    Same contract as :func:`fused_search_pallas` but returns the k best:
    (d2 (nb, Qs, k) ascending, sorted-cloud rows (nb, Qs, k),
    bound (nb, Qs)).  The candidate d2 tile lives in VMEM scratch and the k
    argmin/mask extraction passes never touch HBM — vs the XLA path's k
    full re-reads of the (n, P*g) candidate matrix.
    """
    G, g, _ = points.shape
    nb, Qs, _ = xb.shape
    P = bsel.shape[1]
    if k > P * g:
        raise ValueError(f"k={k} exceeds the {P * g} candidates per block")
    Gp = -(-G // 128) * 128

    CH = min(512, P * g)
    ncol = -(-(P * g) // CH)
    padC = ncol * CH - P * g

    cand = points.astype(jnp.float32)[bsel]                  # (nb, P, g, 3)
    candT = jnp.transpose(cand, (0, 3, 1, 2)).reshape(nb, 3, P * g)
    if padC:
        candT = jnp.concatenate(
            [candT, jnp.full((nb, 3, padC), 1.0e15, jnp.float32)], axis=2)
    centT = jnp.swapaxes(centers.astype(jnp.float32), 0, 1)  # (3, G)
    padG = Gp - G
    if padG:
        centT = jnp.concatenate(
            [centT, jnp.full((3, padG), 1.0e15, jnp.float32)], axis=1)
        radp = jnp.concatenate(
            [radius.astype(jnp.float32), jnp.zeros((padG,), jnp.float32)])
    else:
        radp = radius.astype(jnp.float32)

    eps8 = float(8.0 * jnp.finfo(jnp.float32).eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, Qs, 3), lambda i, bs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ncol * CH), lambda i, bs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Gp), lambda i, bs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda i, bs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, Qs), lambda i, bs: (i, 0, 0)),
            pl.BlockSpec((1, k, Qs), lambda i, bs: (i, 0, 0)),
            pl.BlockSpec((1, 1, Qs), lambda i, bs: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((Qs, ncol * CH), jnp.float32)],
    )
    best, bcol, bound = pl.pallas_call(
        _make_topk_kernel(P, g, Qs, Gp, eps8, CH, ncol, k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, k, Qs), jnp.float32),
            jax.ShapeDtypeStruct((nb, k, Qs), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, Qs), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nb * Qs * (8 * P * g + 4 * k * ncol * CH + 10 * Gp),
            bytes_accessed=(nb * (3 * Qs + 3 * P * g + (2 * k + 1) * Qs)
                            + 4 * Gp) * 4,
            transcendentals=nb * Qs * Gp),
        interpret=interpret,
    )(bsel.reshape(-1).astype(jnp.int32), xb.astype(jnp.float32), candT,
      centT, radp[None, :])
    rowbase = (bsel[:, :, None].astype(jnp.int32) * g
               + jnp.arange(g, dtype=jnp.int32)[None, None, :]
               ).reshape(nb, P * g)
    row = jnp.take_along_axis(
        rowbase, bcol.reshape(nb, k * Qs), axis=1).reshape(nb, k, Qs)
    return (jnp.transpose(best, (0, 2, 1)), jnp.transpose(row, (0, 2, 1)),
            bound[:, 0, :])
