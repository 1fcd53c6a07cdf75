"""Pallas dense-block fill: sorted member slices -> raster dense blocks.

The placement step of the block-dense sparse conv (ops/block_conv.py): block
b's points sit contiguously in the z-sorted order at [start_b, start_b+count_b);
each must land at its raster-local slot of the dense [b3, C] tile. XLA offers
only serialized scatters (~10 M rows/s) or an HBM-materialized one-hot matmul
(1.7 GB of one-hot per fill at 102k points); here the one-hot lives in VMEM per
block and placement runs on the MXU:

  per grid cell b (double-buffered window DMAs across cells):
    DMA  feat_sorted[align128(start_b) : +b3+128]  -> VMEM
    DMA  rc_sorted  [same window]                  -> VMEM
         (rc = block_rank * b3 + raster_local identifies each point's dense
          slot; one compare handles block membership, window offset and
          padding simultaneously)
    oh[s, k] = (rc[k] == b * b3 + s)               (VPU, in VMEM)
    out[b]   = oh @ members                        (MXU)

The final grid cell emits the all-zero block that halo expansion gathers for
missing neighbors. The VJP is a pure gather (each point occupies exactly one
dense slot) — see ops/block_conv.py `_block_fill`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 128  # window alignment satisfying both sublane (8) and lane (128) tiling


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fill_kernel(starts_ref, feat_hbm, rc_hbm, out_ref, mem, rcv, sems, *, b3, w, group):
    g = pl.program_id(0)
    ncells = pl.num_programs(0)
    rows = group * b3

    def dmas(cell, slot):
        start = pl.multiple_of(starts_ref[cell], ALIGN)
        return (
            pltpu.make_async_copy(feat_hbm.at[pl.ds(start, w)], mem.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(rc_hbm.at[:, pl.ds(start, w)], rcv.at[slot], sems.at[slot, 1]),
        )

    @pl.when(g == 0)
    def _():
        d1, d2 = dmas(0, 0)
        d1.start()
        d2.start()

    @pl.when(g + 1 < ncells)
    def _():
        d1, d2 = dmas(g + 1, (g + 1) % 2)
        d1.start()
        d2.start()

    d1, d2 = dmas(g, g % 2)
    d1.wait()
    d2.wait()

    slot = g % 2
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    rc = rcv[slot][0]  # [w] int32
    oh = rc[None, :] == (s_iota + g * rows)
    res = jax.lax.dot_general(
        oh.astype(mem.dtype), mem[slot],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # slice the lane padding away in VMEM (an XLA-side slice would copy the
    # whole dense tensor)
    out_ref[0] = res[:, : out_ref.shape[-1]].astype(out_ref.dtype)


def default_fill_group(b3: int) -> int:
    """Blocks per grid cell: small blocks (4^3) are per-cell-overhead bound, so
    batch consecutive ranks into one window DMA + one one-hot matmul. 512-row
    one-hots keep the MXU pass efficient without inflating window FLOPs."""
    return max(1, 512 // b3)


def block_fill_pallas(feat_sorted: jnp.ndarray, rc_sorted: jnp.ndarray, starts: jnp.ndarray,
                      b3: int, group: int = 0) -> jnp.ndarray:
    """feat_sorted [N, C] (any float), rc_sorted [N] int32 (-1 = no slot;
    rc = rank * b3 + raster_local), starts [m] int32 (member window starts)
    -> dense [ngroups * group * b3, C] in feat_sorted's dtype, where rows
    [rank*b3, (rank+1)*b3) hold block `rank`'s tile for rank < m and every row
    beyond (incl. the trash/zero tile at rank m) is zero. The row count is
    ceil((m+1)/group)*group*b3 >= (m+1)*b3."""
    n, c = feat_sorted.shape
    m = starts.shape[0]
    group = group or default_fill_group(b3)
    ngroups = (m + 1 + group - 1) // group
    rows = group * b3
    # window covers `group` consecutive blocks' members (they are contiguous in
    # the sorted order, <= group*b3 rows) after aligning the start down; DMA
    # lane extents must be 128-multiples (b3=64 alone would give 192)
    w = ((group * b3 + ALIGN + 127) // 128) * 128
    # lane alignment: DMA slices need 128-multiple lane extents -> pad channels
    c_eff = ((c + 127) // 128) * 128
    if c_eff != c:
        feat_sorted = jnp.pad(feat_sorted, ((0, 0), (0, c_eff - c)))
    # pad rows so the fixed-size aligned window DMA never reads out of range
    fpad = jnp.concatenate([feat_sorted, jnp.zeros((w, c_eff), feat_sorted.dtype)])
    rcpad = jnp.concatenate([rc_sorted, jnp.full((w,), -1, jnp.int32)])[None, :]
    # aligned per-group window starts (group g = ranks [g*group, (g+1)*group));
    # groups past the last valid block read the padded tail (rc = -1 there, so
    # nothing matches and their tiles stay zero)
    gstarts = starts[:: group] if group > 1 else starts
    starts_al = (gstarts // ALIGN) * ALIGN
    if ngroups > starts_al.shape[0]:
        starts_al = jnp.concatenate(
            [starts_al, jnp.full((ngroups - starts_al.shape[0],), n, jnp.int32)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            # keep the big padded arrays in HBM; the kernel DMAs its window
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda g, *_: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, w, c_eff), feat_sorted.dtype),
            pltpu.VMEM((2, 1, w), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fill_kernel, b3=b3, w=w, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups, rows, c), feat_sorted.dtype),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * ngroups * rows * w * c_eff,
            bytes_accessed=2 * ngroups * rows * c_eff * feat_sorted.dtype.itemsize,
            transcendentals=0,
        ),
    )(starts_al, fpad, rcpad)
    return out.reshape(ngroups * rows, c)
