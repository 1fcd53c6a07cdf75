"""Pallas dense-block fill: sorted member slices -> raster dense blocks.

The placement step of the block-dense sparse conv (ops/block_conv.py): block
b's points sit contiguously in the z-sorted order at [start_b, start_b+count_b);
each must land at its raster-local slot of the dense [b3, C] tile. XLA offers
only serialized scatters (~10 M rows/s) or an HBM-materialized one-hot matmul
(1.7 GB of one-hot per fill at 102k points); here the one-hot lives in VMEM per
block and placement runs on the MXU:

  per grid cell b:
    DMA  feat_sorted[start_b : start_b + b3]  -> VMEM   (contiguous rows)
    DMA  rl_sorted [start_b : start_b + b3]   -> VMEM   (raster locals)
    oh[s, k] = (rl[k] == s) & (k < count_b)             (VPU, 512x512 in VMEM)
    out[b]   = oh @ members                             (MXU)

The VJP is a pure gather (each point occupies exactly one dense slot) — see
ops/block_conv.py `_block_fill`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fill_kernel(starts_ref, counts_ref, feat_hbm, rl_hbm, out_ref, mem, rlv, sem1, sem2, *, b3, m):
    b = pl.program_id(0)
    # the final grid cell is the all-zero block that halo expansion gathers for
    # missing neighbors (emitting it here avoids a full-tensor concat copy)
    start = starts_ref[jnp.minimum(b, m - 1)]
    count = jnp.where(b < m, counts_ref[jnp.minimum(b, m - 1)], 0)
    cp1 = pltpu.make_async_copy(feat_hbm.at[pl.ds(start, b3)], mem, sem1)
    cp2 = pltpu.make_async_copy(rl_hbm.at[:, pl.ds(start, b3)], rlv, sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (b3, b3), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (b3, b3), 1)
    rl = rlv[0]  # [b3] int32
    oh = (s_iota == rl[None, :]) & (k_iota < count)
    out_ref[0] = jax.lax.dot_general(
        oh.astype(mem.dtype), mem[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def block_fill_pallas(feat_sorted: jnp.ndarray, rl_sorted: jnp.ndarray, starts: jnp.ndarray,
                      counts: jnp.ndarray, b3: int) -> jnp.ndarray:
    """feat_sorted [N, C] (any float), rl_sorted [N] int32 (b3 = no slot),
    starts/counts [m] int32 -> dense [(m+1) * b3, C] in feat_sorted's dtype
    (the trailing block is all zeros, for missing-neighbor halo gathers)."""
    n, c = feat_sorted.shape
    m = starts.shape[0]
    # pad so the fixed-size window DMA never reads out of range
    fpad = jnp.concatenate([feat_sorted, jnp.zeros((b3, c), feat_sorted.dtype)])
    rlpad = jnp.concatenate([rl_sorted, jnp.full((b3,), b3, jnp.int32)])[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, b3, c), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b3, c), feat_sorted.dtype),
            pltpu.VMEM((1, b3), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fill_kernel, b3=b3, m=m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m + 1, b3, c), feat_sorted.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * b3 * b3 * c,
            bytes_accessed=2 * m * b3 * c * feat_sorted.dtype.itemsize,
            transcendentals=0,
        ),
    )(starts, counts, fpad, rlpad)
    return out.reshape((m + 1) * b3, c)
