"""Pallas kernel for the cluster-index block search (TPU fast path).

The XLA formulation of the block-scattered search (ops/cluster_knn)
materializes the (nb, Qb, P*g) candidate distance matrix in HBM (~1.2 GB at
100k, several ms of bandwidth).  This kernel fuses gather + distance +
running argmin entirely in VMEM:

  grid = (nb,)   one program per query block
  - the block's P group indices arrive via scalar prefetch, so the kernel
    DMAs each (g, 3) group slab from HBM with double buffering while the
    previous slab's (Qb, g) distance tile is reduced on the VPU
  - the running (best-d2, best-row) accumulator lives in registers across
    the P-group fori_loop; one (Qb,) result pair is written per block

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
