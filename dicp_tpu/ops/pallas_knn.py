"""Tiled Pallas 1-NN kernel for TPU.

This is the TPU-native ownership of the reference's performance hot spot —
the brute-force O(n*m) distance/argmin (torch.cdist + argmin at
dICP/nn.py:32-38, the dominant cost in SURVEY.md §3.2).  Instead of
materializing one dense (n, m) distance matrix in HBM, the kernel streams
target tiles through VMEM (Pallas double-buffers the HBM->VMEM DMA
automatically via the BlockSpec pipeline) and carries a running
(best-distance, best-index) accumulator per query row:

  grid = (query_tiles, target_tiles)        # target axis minor => sequential
  x tile:  (TQ, 3) resident per query tile
  y tile:  (TM, 3) streamed
  d2 tile: (TQ, TM) = |y|^2 - 2 x.y^T on the MXU (full f32 precision; the
           |x|^2 row constant cannot change the argmin and is added back at
           the end), reduced to (TQ, 1) min/argmin on the VPU.

Padding: query rows are padded to TQ (results sliced off); target rows are
padded with +1e30 so d2 = +inf never wins the min — replacing the
reference's max(source)*1000 sentinel trick (dICP/ICP.py:460) with a mask
that costs nothing.

Ties resolve to the lowest index (first occurrence), matching
jnp.argmin/torch.argmin semantics across tiles because a strict '<' keeps
the earlier tile's winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: TQ queries x TM targets -> (TQ, TM) f32 distance tile in VMEM.
# 256 x 2048 x 4B = 2 MB per tile + buffers, comfortably inside ~16 MB VMEM.
# Chained-methodology A/B on v5e (BENCH.md): 256x2048 = 62 ms for 100k x
# 100k vs 79 ms at 512x1024 — keep the long-lane tile.
_TQ = 256
_TM = 2048
_PAD_VAL = 1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _nn_kernel(x_ref, y_ref, idx_out, d2_out, best_d2, best_idx):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_d2[:] = jnp.full_like(best_d2, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    x = x_ref[:]  # (TQ, 3)
    y = y_ref[:]  # (TM, 3)
    # Exact per-coordinate distance tile on the VPU: three broadcast FMA
    # passes over (TQ, TM).  (A K=3 dot_general looks like the MXU move but
    # Mosaic lowers it to a lane-padded (TQ, TM, 128) broadcast — ~64 MB of
    # scoped VMEM; this form keeps ~2 tiles live and has no |x|^2+|y|^2-2xy
    # cancellation error.)
    d2 = jnp.zeros((x.shape[0], y.shape[0]), jnp.float32)
    for c in range(3):
        diff = x[:, c][:, None] - y[:, c][None, :]
        d2 = d2 + diff * diff

    local_min = jnp.min(d2, axis=1, keepdims=True)          # (TQ, 1)
    # first-index-of-min via masked iota-min: two plain VPU reductions.
    # (jnp.argmin's tuple-reduce lowering also blows the scoped-VMEM stack.)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    local_arg = jnp.min(jnp.where(d2 == local_min, col, jnp.int32(2**30)),
                        axis=1, keepdims=True)
    global_arg = local_arg + j * y.shape[0]

    better = local_min < best_d2[:]
    best_d2[:] = jnp.where(better, local_min, best_d2[:])
    best_idx[:] = jnp.where(better, global_arg, best_idx[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_out[:] = best_idx[:]
        d2_out[:] = best_d2[:]


@functools.partial(jax.jit, static_argnames=("tq", "tm", "interpret"))
def _nn_pallas_2d(x: jnp.ndarray, y: jnp.ndarray, tq: int, tm: int,
                  interpret: bool):
    """(n, 3) x (m, 3) -> (idx (n,), d2 (n,)) via the tiled kernel."""
    n, m = x.shape[0], y.shape[0]
    n_pad = _cdiv(n, tq) * tq
    m_pad = _cdiv(m, tm) * tm
    xp = jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, m_pad - m), (0, 0)),
                 constant_values=_PAD_VAL)

    grid = (n_pad // tq, m_pad // tm)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
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
            flops=2 * n_pad * m_pad * 3,
            bytes_accessed=(n_pad * 3 + grid[0] * m_pad * 3 + 2 * n_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, yp)
    return idx[:n, 0], d2[:n, 0]


def nn_indices_pallas(x: jnp.ndarray, y: jnp.ndarray,
                      tq: int = _TQ, tm: int = _TM,
                      interpret: bool | None = None):
    """Nearest-neighbor indices via the tiled Pallas kernel.

    x (..., n, 3) queries, y (..., m, 3) targets -> (..., n) int32.
    Batch dims are vmapped over the 2-D kernel.  ``interpret=None`` auto
    selects interpreter mode off-TPU (for CPU tests).
    """
    return nn_distances_pallas(x, y, tq=tq, tm=tm, interpret=interpret)[0]


def nn_distances_pallas(x: jnp.ndarray, y: jnp.ndarray,
                        tq: int = _TQ, tm: int = _TM,
                        interpret: bool | None = None):
    """(indices, squared distances) of the 1-NN of each query."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = functools.partial(_nn_pallas_2d, tq=tq, tm=tm, interpret=interpret)
    batch_shape = x.shape[:-2]
    for _ in batch_shape:
        fn = jax.vmap(fn)
    return fn(x[..., :3], y[..., :3])
