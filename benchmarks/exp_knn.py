"""On-chip A/B experiments for the tiled 1-NN kernel (VERDICT round-2 #1).

Variants (all exact-on-winner; score-form = |y|^2 - 2 x.y, the row-constant
|x|^2 dropped because it cannot change a row argmin):

  v0    current production kernel (VPU broadcast diff-form)
  v1    2-D grid, score tile from ONE MXU dot_general((TQ,8),(8,TM)):
        packed x8 = [x,1,0...]  (TQ,8);  y8 = [-2y,|y|^2,0...]  (8,TM)
  v2    1-D grid over query tiles; manual double-buffered y-slab DMA with
        the tile-t matmul (MXU) scheduled against the tile-(t-1) min/argmin
        (VPU) — flash-attention-style overlap
  v1b   v1 with explicit (PARALLEL, ARBITRARY) dimension semantics

Timing uses benchmarks.timing.chained_rate (chained lax.scan + host fetch —
see BENCH.md for why naive wall-clock lies on this runtime).

Run: JAX_PLATFORMS=tpu,cpu python benchmarks/exp_knn.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import chained_rate

_PAD_VAL = 1e30
# HIGHEST = 3-pass bf16 decomposition (~f32); DEFAULT = single bf16 pass.
# Score-form cancellation: error ~ eps * R^2 absolute, so DEFAULT (bf16,
# eps ~ 8e-3) flips real argmins at R = 50; HIGHEST flips only f32 ties.
_PRECISION = jax.lax.Precision.HIGHEST


def _cdiv(a, b):
    return -(-a // b)


def _pack_x8(x):
    n = x.shape[0]
    return jnp.concatenate(
        [x, jnp.ones((n, 1), x.dtype), jnp.zeros((n, 4), x.dtype)], axis=1)


def _pack_y8(y, m_pad):
    """(m,3) -> (8, m_pad): rows [-2y0,-2y1,-2y2,|y|^2,0,0,0,0]; padded
    columns get |y|^2 = PAD so their score can never win."""
    m = y.shape[0]
    norm2 = jnp.sum(y * y, axis=1)
    packed = jnp.concatenate(
        [-2.0 * y.T, norm2[None], jnp.zeros((4, m), y.dtype)], axis=0)
    if m_pad > m:
        pad = jnp.zeros((8, m_pad - m), y.dtype).at[3].set(_PAD_VAL)
        packed = jnp.concatenate([packed, pad], axis=1)
    return packed


# ----------------------------------------------------------- v1: 2-D grid MXU
def _kernel_v1(x_ref, y_ref, idx_out, s_out, best_s, best_idx):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    s = jax.lax.dot_general(
        x_ref[:], y_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION)                                # (TQ, TM) MXU
    local_min = jnp.min(s, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    local_arg = jnp.min(jnp.where(s == local_min, col, jnp.int32(2**30)),
                        axis=1, keepdims=True)
    global_arg = local_arg + j * s.shape[1]

    better = local_min < best_s[:]
    best_s[:] = jnp.where(better, local_min, best_s[:])
    best_idx[:] = jnp.where(better, global_arg, best_idx[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_out[:] = best_idx[:]
        s_out[:] = best_s[:]


@functools.partial(jax.jit, static_argnames=("tq", "tm", "semantics"))
def nn_v1(x, y, tq=256, tm=2048, semantics=False):
    n, m = x.shape[0], y.shape[0]
    n_pad, m_pad = _cdiv(n, tq) * tq, _cdiv(m, tm) * tm
    x8 = jnp.pad(_pack_x8(x.astype(jnp.float32)), ((0, n_pad - n), (0, 0)))
    y8 = _pack_y8(y.astype(jnp.float32), m_pad)
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.ARBITRARY))
    idx, s = pl.pallas_call(
        _kernel_v1,
        grid=(n_pad // tq, m_pad // tm),
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * 8,
            bytes_accessed=(n_pad * 8 + (n_pad // tq) * m_pad * 8 + 2 * n_pad) * 4,
            transcendentals=0),
        **params,
    )(x8, y8)
    return idx[:n, 0], s[:n, 0]


# ------------------------------------- v2: 1-D grid, manual DB, MXU/VPU overlap
def _make_kernel_v2(tm, m_pad):
    nt = m_pad // tm

    def kernel(x_ref, y_hbm, idx_out, s_out, ybuf, sbuf, best_s, best_idx, sem):
        def get_dma(slot, t):
            return pltpu.make_async_copy(
                y_hbm.at[:, pl.ds(t * tm, tm)], ybuf.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

        def reduce_tile(t):
            s = sbuf[t % 2]
            local_min = jnp.min(s, axis=1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            local_arg = jnp.min(
                jnp.where(s == local_min, col, jnp.int32(2**30)),
                axis=1, keepdims=True)
            better = local_min < best_s[:]
            best_s[:] = jnp.where(better, local_min, best_s[:])
            best_idx[:] = jnp.where(better, local_arg + t * tm, best_idx[:])

        def body(t, _):
            slot = t % 2

            @pl.when(t + 1 < nt)
            def _():
                get_dma((t + 1) % 2, t + 1).start()

            get_dma(slot, t).wait()
            sbuf[slot] = jax.lax.dot_general(
                x_ref[:], ybuf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PRECISION)

            @pl.when(t > 0)
            def _reduce_prev():
                reduce_tile(t - 1)

            return 0

        jax.lax.fori_loop(0, nt, body, 0)
        reduce_tile(nt - 1)
        idx_out[:] = best_idx[:]
        s_out[:] = best_s[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("tq", "tm"))
def nn_v2(x, y, tq=256, tm=2048):
    n, m = x.shape[0], y.shape[0]
    n_pad, m_pad = _cdiv(n, tq) * tq, _cdiv(m, tm) * tm
    x8 = jnp.pad(_pack_x8(x.astype(jnp.float32)), ((0, n_pad - n), (0, 0)))
    y8 = _pack_y8(y.astype(jnp.float32), m_pad)
    idx, s = pl.pallas_call(
        _make_kernel_v2(tm, m_pad),
        grid=(n_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, tm), jnp.float32),
            pltpu.VMEM((2, tq, tm), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * 8,
            bytes_accessed=(n_pad * 8 + (n_pad // tq) * m_pad * 8 + 2 * n_pad) * 4,
            transcendentals=0),
    )(x8, y8)
    return idx[:n, 0], s[:n, 0]


# ----------------------------------------------------------------- harness
def check(name, fn, x, y):
    """Correctness vs f64 dense argmin; tie-aware: a flip is acceptable iff
    the true (f64) distances of the two candidates differ by less than the
    f32 score-form rounding bound ~ 64*eps*R^2 (genuine numerical ties)."""
    idx, _ = fn(x, y)
    idx = np.asarray(jax.device_get(idx))
    xh = np.asarray(x, np.float64)
    yh = np.asarray(y, np.float64)
    d2 = np.sum((xh[:, None, :] - yh[None, :, :]) ** 2, axis=-1)
    ref = np.argmin(d2, axis=1)
    r2 = max(np.abs(xh).max(), np.abs(yh).max()) ** 2
    tie_tol = 64 * np.finfo(np.float32).eps * r2
    bad = idx != ref
    n_bad = int(bad.sum())
    if n_bad:
        rows = np.nonzero(bad)[0]
        gaps = np.abs(d2[rows, idx[rows]] - d2[rows, ref[rows]])
        worst = float(gaps.max())
        print(f"  {name}: {n_bad}/{len(idx)} argmin flips, worst true-d2 gap "
              f"{worst:.2e} (tie tol {tie_tol:.2e}) "
              f"{'(ties only)' if worst < tie_tol else '(REAL ERROR)'}")
        return worst < tie_tol
    print(f"  {name}: exact match ({len(idx)} rows)")
    return True


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)

    # correctness at 4096 x 4096 (2 target tiles -> exercises the carry)
    xs = jnp.asarray(rng.uniform(-50, 50, size=(4096, 3)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-50, 50, size=(4096, 3)).astype(np.float32))
    from dicp_tpu.ops.pallas_knn import nn_distances_pallas
    print("correctness (4096x4096):", flush=True)
    ok = True
    ok &= check("v0", lambda a, b: nn_distances_pallas(a, b), xs, ys)
    ok &= check("v1", lambda a, b: nn_v1(a, b), xs, ys)
    ok &= check("v2", lambda a, b: nn_v2(a, b), xs, ys)
    assert ok, "correctness failure beyond tie tolerance"

    # timing at 100k x 100k
    n = 100_000
    x = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32))

    def step_of(fn):
        def step(src, tgt):
            idx, s = fn(src, tgt)
            return jnp.sum(idx.astype(jnp.float32)) * 1e-9 + jnp.sum(s) * 1e-30
        return step

    variants = [
        ("v0 prod (VPU diff)", lambda a, b: nn_distances_pallas(a, b)),
        ("v1 MXU 2-D 256x2048", lambda a, b: nn_v1(a, b)),
        ("v1 MXU 2-D 512x4096", lambda a, b: nn_v1(a, b, tq=512, tm=4096)),
        ("v1b MXU semantics", lambda a, b: nn_v1(a, b, semantics=True)),
        ("v2 MXU DB 256x2048", lambda a, b: nn_v2(a, b)),
        ("v2 MXU DB 256x4096", lambda a, b: nn_v2(a, b, tm=4096)),
        ("v2 MXU DB 512x2048", lambda a, b: nn_v2(a, b, tq=512)),
    ]
    for name, fn in variants:
        t0 = time.time()
        try:
            dt = chained_rate(step_of(fn), x, y, k_small=2, k_big=6)
            print(f"{name}: {dt*1e3:.1f} ms  (wall incl compile "
                  f"{time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
