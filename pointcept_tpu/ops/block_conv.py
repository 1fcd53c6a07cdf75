"""Block-dense submanifold convolution — the TPU-native sparse-conv engine.

Replaces gather-GEMM over per-point neighbor maps (ops/sparse_conv.py) for the
PTv3 stem/xCPE convs (reference spconv SubMConv3d,
`point_transformer_v3m1_base.py:277-287,498`). Key idea: the z-order
serialization already groups points into 2^b-sized cubic blocks — points of one
block are CONTIGUOUS in the sorted order. So:

1. scatter point features into a dense [nB, B, B, B, C] tensor of occupied
   blocks (one coalesced scatter — the block decomposition is just the high
   bits of the existing curve code);
2. build a halo'd tile per block from the 27 neighbor blocks (static slices +
   block-granular row gathers + concats — exact, including diagonals whose
   face neighbors are unoccupied);
3. run ONE dense `lax.conv` over all blocks (MXU systolic work, VMEM-windowed
   by XLA — no materialized im2col);
4. gather outputs back at the occupied slots.

Submanifold semantics fall out exactly: unoccupied voxels hold zeros so they
contribute nothing, and only occupied slots are read back. Compute is ~B³/avg
points-per-block times redundant (8³ indoor blocks hold ~60-100 points → ~5-8×
extra MXU FLOPs), but it replaces the ~10× slower irregular-gather traffic
that dominates the profile (im2col tensors of 150-350 MB per conv + layout
copies + validity selects).

Everything is static-shape: `block_capacity` bounds the number of occupied
blocks (overflow blocks fall into a trash slot and output zeros — size it with
margin; indoor surface scans occupy ~N/64 blocks at B=8).
"""

from __future__ import annotations

import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.permute import permute_rows
from pointcept_tpu.ops.sparse_conv import lex_lookup

# neighbor offsets in C-order over (dx, dy, dz) ∈ {-1,0,1}³ (center included)
OFFS27 = list(itertools.product((-1, 0, 1), repeat=3))
CENTER27 = OFFS27.index((0, 0, 0))


def build_block_tables(
    keys0: jnp.ndarray,  # [N, 3] serialized key triples, order "z" (or any morton order)
    order0: jnp.ndarray,  # [N] argsort of keys0
    grid_coord: jnp.ndarray,  # [N, 3]
    mask: jnp.ndarray,  # [N] valid points
    depth: int,
    block_capacity: int,
    block_bits: int = 3,
    inverse0: Optional[jnp.ndarray] = None,
    curve_is_z: bool = True,
    identity_order0: bool = False,
    count_overflow: bool = False,
    scene_capacity: Optional[int] = None,
    scene_block_capacity: Optional[int] = None,
) -> dict:
    """In-graph block structure from the existing serialization.

    Scatter-free (TPU scatters serialize): cluster ids route through gathers of
    the inverse permutation, block attributes through ONE compaction sort, and
    the dense fill through the Pallas one-hot kernel driven by per-block
    member windows.

    Returns dict with:
      slot        [N] int32 — raster dense row of each point (output gather /
                  fill VJP); m*B^3 = trash for padding/overflow
      order0/inverse0 [N] int32 — the z-sort permutation and its inverse
      nbr         [nB, 27] int32 — neighbor block ranks in OFFS27 order,
                  block_capacity = missing (center column = self)
      block_grid  [nB, 3] int32 — coarse grid of each block (diagnostics)
      fill_start/fill_count [nB] int32 — each block's member window in the
                  sorted order
      rl_sorted   [N] int32 — raster-local of each sorted point (B^3 = none)
    """
    n = keys0.shape[0]
    bb = block_bits
    b3 = 1 << (3 * bb)
    m = block_capacity
    if not curve_is_z:
        # the fill layout needs plain morton locals: the within-block ordering
        # of hilbert (or shuffled) curves is position-dependent, so re-sort by
        # the z curve (one cheap sort; batch ids live in keys0[:, 0])
        keys0 = ser.encode(grid_coord, keys0[:, 0], depth, "z")
        order0 = ser.argsort_keys(keys0, depth)
        inverse0 = ser.invert_order(order0)
        identity_order0 = False
    if inverse0 is None:
        inverse0 = ser.invert_order(order0)

    # block id per point = run index of equal (batch, code >> 3*bb) in sorted order
    shifted = ser.key_shift_right(keys0, 3 * bb)
    if identity_order0:
        # sorted-persistent layout: the batch IS in order-0 order
        sk = shifted
        valid_sorted = mask
    else:
        sk = shifted[order0]
        valid_sorted = mask[order0]
    prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
    head = valid_sorted & ~prev_eq
    if scene_capacity is not None:
        # scene-blocked layout (PointBatch.scene_capacity): blocks get
        # PER-SCENE ranks so the dense tensor keeps static scene regions of
        # scene_block_capacity rows each — fill windows then never span the
        # scene-tail padding gaps of the sorted layout.
        assert identity_order0 and curve_is_z, "scene-blocked tables need the pinned z layout"
        mb_s = scene_block_capacity
        S = n // scene_capacity
        assert mb_s is not None and m == S * mb_s
        cnt = jnp.cumsum(head.astype(jnp.int32))  # inclusive
        bnd = np.arange(S) * scene_capacity
        base = jnp.where(jnp.asarray(bnd) > 0, cnt[np.maximum(bnd - 1, 0)], 0)
        srow = jnp.arange(n, dtype=jnp.int32) // scene_capacity
        rank_sorted = (cnt - 1) - base[srow] + srow * mb_s
        rank_ok = valid_sorted & ((cnt - 1) - base[srow] < mb_s)
    else:
        rank_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
        rank_ok = valid_sorted & (rank_sorted < m)
    if identity_order0:
        rank_of_point = jnp.where(rank_ok, rank_sorted, m)
    else:
        rank_of_point = jnp.take(jnp.where(rank_ok, rank_sorted, m), inverse0, axis=0)

    pos = jnp.arange(n, dtype=jnp.int32)
    if identity_order0:
        mlocal_sorted = keys0[:, 2] & (b3 - 1)
    else:
        mlocal_sorted = jnp.take(keys0[:, 2], order0, axis=0) & (b3 - 1)

    # block attribute compaction: ONE sort -> position of each block's head
    if scene_capacity is not None:
        from pointcept_tpu.ops.segment_ops import scene_compaction

        block_valid, hsel = scene_compaction(head, cnt, S, scene_capacity, mb_s)
    else:
        head_rank = jnp.where(head & rank_ok, rank_sorted, jnp.int32(n))
        hr, hpos = jax.lax.sort((head_rank, pos), num_keys=1, is_stable=False)
        if m > n:  # block capacity can exceed the point count in tiny configs
            hr = jnp.concatenate([hr, jnp.full((m - n,), n, jnp.int32)])
            hpos = jnp.concatenate([hpos, jnp.zeros((m - n,), jnp.int32)])
        block_valid = hr[:m] < n
        hsel = hpos[:m]
    head_point = hsel if identity_order0 else jnp.take(order0, hsel, axis=0)
    block_grid = jnp.where(block_valid[:, None], jnp.take(grid_coord, head_point, axis=0) >> bb, 0)
    if scene_capacity is not None:
        # per-scene sentinels keep the lex table ascending despite the invalid
        # rank slots interspersed at scene tails
        imax = jnp.int32(2**31 - 1)
        slot_scene = jnp.arange(m, dtype=jnp.int32) // scene_block_capacity
        sentinel_rows = jnp.stack(
            [slot_scene, jnp.full_like(slot_scene, imax), jnp.full_like(slot_scene, imax)],
            axis=-1,
        )
    else:
        sentinel_rows = jnp.broadcast_to(
            jnp.asarray([int(ser.BATCH_SENTINEL), 0, 0], jnp.int32), (m, 3)
        )
    block_keys = jnp.where(
        block_valid[:, None], jnp.take(sk, hsel, axis=0), sentinel_rows
    )  # [m, 3] sorted ascending (ranks were assigned in sorted order)
    block_batch = jnp.where(block_valid, block_keys[:, 0], -1)

    # 26 neighbors via ONE batched sort-merge join over the sorted block keys
    # (a per-offset binary-search loop costs thousands of tiny op launches —
    # ~55 ms/scene in the round-2 profile; see sparse_conv.lex_lookup)
    bdepth = depth - bb
    lim = (1 << bdepth) - 1
    kb, khi, klo = block_keys[:, 0], block_keys[:, 1], block_keys[:, 2]
    noncenter = np.asarray([o for o in OFFS27 if o != (0, 0, 0)], np.int32)
    qg = block_grid[None, :, :] + jnp.asarray(noncenter)[:, None, :]  # [26, m, 3]
    in_range = jnp.all((qg >= 0) & (qg <= lim), axis=-1) & block_valid[None, :]
    q = ser.encode(
        jnp.clip(qg, 0, lim).reshape(-1, 3),
        jnp.where(in_range, block_batch[None, :], ser.BATCH_SENTINEL + 1).reshape(-1),
        bdepth,
        "z",
    )
    jpos = lex_lookup(kb, khi, klo, q[:, 0], q[:, 1], q[:, 2]).reshape(26, m)
    res = jnp.where(jpos >= 0, jpos, m).astype(jnp.int32)
    self_col = jnp.where(block_valid, jnp.arange(m, dtype=jnp.int32), m)[None, :]
    nbr = jnp.concatenate([res[:CENTER27], self_col, res[CENTER27:]], axis=0).T  # [m, 27]

    # dense slot: raster offset within the block (conv layout, NOT morton)
    gx, gy, gz = grid_coord[:, 0], grid_coord[:, 1], grid_coord[:, 2]
    lmask = (1 << bb) - 1
    local = ((gx & lmask) << (2 * bb)) | ((gy & lmask) << bb) | (gz & lmask)
    slot = jnp.where(rank_of_point < m, rank_of_point * b3 + local, m * b3)

    # fill tables (built once per stage, reused by every conv): block b's
    # points sit CONTIGUOUSLY in the sorted order at [start_b, start_b+count_b)
    start = jnp.where(block_valid, hsel, 0)
    nvalid_ok = jnp.sum(rank_ok.astype(jnp.int32))
    next_valid = jnp.concatenate([block_valid[1:], jnp.array([False])])
    next_start = jnp.concatenate([start[1:], jnp.zeros((1,), jnp.int32)])
    ends = jnp.where(next_valid, next_start, nvalid_ok)
    count = jnp.where(block_valid, ends - start, 0)
    # combined slot code of each sorted point (static morton->raster shuffle):
    # rc = rank * b3 + raster_local uniquely identifies the dense slot; -1 for
    # padding/overflow (matches nothing in the fill kernel)
    rl_lut = jnp.asarray(_raster_of_morton_lut(bb))
    rl_sorted = jnp.take(rl_lut, mlocal_sorted, axis=0)
    rc_sorted = jnp.where(rank_ok, rank_sorted * b3 + rl_sorted, -1)

    out = dict(
        slot=slot.astype(jnp.int32),
        order0=order0,
        inverse0=inverse0,
        identity_order0=identity_order0,
        block_bits=bb,
        nbr=nbr,
        block_grid=block_grid,
        fill_start=start.astype(jnp.int32),
        rc_sorted=rc_sorted.astype(jnp.int32),
    )
    if count_overflow:
        # valid points whose block fell beyond block_capacity: these receive
        # zero conv output — must be observed, not silent (one scalar reduce).
        # Opt-in so the eval graph (and its compile cache) is unchanged.
        out["overflow"] = jnp.sum((valid_sorted & ~rank_ok).astype(jnp.int32))
    return out


def _raster_of_morton_lut(block_bits: int) -> np.ndarray:
    """LUT r with raster_local = r[morton_local] for one block."""
    bb = block_bits
    b3 = 1 << (3 * bb)
    r = np.empty(b3, np.int32)
    for v in range(b3):
        lx = ly = lz = 0
        for i in range(bb):
            lx |= ((v >> (3 * i + 2)) & 1) << i
            ly |= ((v >> (3 * i + 1)) & 1) << i
            lz |= ((v >> (3 * i)) & 1) << i
        r[v] = (lx << (2 * bb)) | (ly << bb) | lz
    return r


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _block_fill(feat, rc_sorted, starts, slot_order, b3: int, compute_dtype, identity: bool = False):
    """Dense raster fill [(nb+1)*b3, C] via the Pallas one-hot MXU kernel — no
    scatters, no HBM one-hot (ops/pallas/block_fill.py).

    slot_order = (slot, order0, inverse0): slot drives the gather-only VJP
    (each valid point occupies exactly one dense slot)."""
    from pointcept_tpu.ops.pallas.block_fill import block_fill_pallas

    slot, order0, inverse0 = slot_order
    if identity:  # sorted-persistent layout: feat already in z order
        feat_sorted = feat.astype(compute_dtype)
    else:
        feat_sorted = jnp.take(feat.astype(compute_dtype), order0, axis=0)
    return block_fill_pallas(feat_sorted, rc_sorted, starts, b3)


def _block_fill_fwd(feat, rc_sorted, starts, slot_order, b3, compute_dtype, identity=False):
    out = _block_fill(feat, rc_sorted, starts, slot_order, b3, compute_dtype, identity)
    # residuals must be arrays: slot + a dtype witness (+ shape witnesses)
    return out, (slot_order[0], jnp.zeros((0,), feat.dtype), rc_sorted, starts)


def _block_fill_bwd(b3, compute_dtype, identity, res, g):
    # d/dfeat: each valid point occupies exactly one dense slot -> pure gather.
    # Valid slots are ranks < m (= starts rows); rows beyond — the trash/zero
    # tile and grouped-fill padding — are not real slots.
    slot, dtype_witness, rc_sorted, starts = res
    total = starts.shape[0] * b3
    safe = jnp.minimum(slot, total - 1)
    gf = jnp.where((slot < total)[:, None], jnp.take(g, safe, axis=0), 0).astype(dtype_witness.dtype)
    z1 = np.zeros(rc_sorted.shape, jax.dtypes.float0)
    zm = np.zeros(starts.shape, jax.dtypes.float0)
    zs = np.zeros(slot.shape, jax.dtypes.float0)
    return (gf, z1, zm, (zs, zs, zs))


_block_fill.defvjp(_block_fill_fwd, _block_fill_bwd)


def _halo_expand_flat(dense2: jnp.ndarray, nbr: jnp.ndarray, bsz: int, halo: int, c: int) -> jnp.ndarray:
    """[R, B^3*C] -> [R, H^3*C] (H = B + 2*halo), raster x-major halo tiles.

    Same 27-region assembly as `_halo_expand`, but every piece stays a flat
    row-major 2-D/3-D array: gathers stream full rows, the nested z/y/x concats
    reproduce the raster interleave via cheap reshapes, and the consumer (the
    Pallas tap-conv kernel, ops/pallas/tap_conv.py) has a fixed row-major
    layout — so XLA emits NO 5-D layout copies (the round-2b profile's 20.5%
    layout/copy bucket came from `lax.conv`'s NDHWC tiling preferences)."""
    if halo == 0:
        return dense2
    r = dense2.shape[0]
    hsz = bsz + 2 * halo
    d5 = dense2.reshape(r, bsz, bsz, bsz, c)
    pieces_x = []
    for a in (-1, 0, 1):
        x0, x1 = _slab(a, bsz, halo)
        sx = x1 - x0
        pieces_y = []
        for b in (-1, 0, 1):
            y0, y1 = _slab(b, bsz, halo)
            sy = y1 - y0
            pieces_z = []
            for cc in (-1, 0, 1):
                z0, z1 = _slab(cc, bsz, halo)
                sz = z1 - z0
                sub = d5[:, x0:x1, y0:y1, z0:z1, :]
                if (a, b, cc) == (0, 0, 0):
                    src = sub
                else:
                    k = OFFS27.index((a, b, cc))
                    src = jnp.take(sub.reshape(r, -1), nbr[:, k], axis=0).reshape(sub.shape)
                pieces_z.append(src.reshape(r, sx * sy, sz * c))
            pieces_y.append(jnp.concatenate(pieces_z, axis=2).reshape(r, sx, sy, hsz * c))
        pieces_x.append(jnp.concatenate(pieces_y, axis=2).reshape(r, sx, hsz * hsz * c))
    return jnp.concatenate(pieces_x, axis=1).reshape(r, hsz * hsz * hsz * c)


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_conv(dense_flat, nbr_ext, weight, bsz: int, ksz: int, compute_dtype):
    """Fused block conv: flat halo assembly + Pallas im2col tap-GEMM.

    dense_flat [R*B^3, Cin] (output of `_block_fill`), nbr_ext [R, 27],
    weight [k^3, Cin, Cout] -> [R*B^3, Cout]. The VJP is scatter-free:
    d_dense is the SAME halo-expand + kernel applied to the output cotangent
    with the flipped-transposed weight (cross-correlation duality on the same
    neighbor table), dW accumulates im2col^T @ g in a second Pallas kernel.
    """
    from pointcept_tpu.ops.pallas.tap_conv import tap_conv

    r = nbr_ext.shape[0]
    b3 = bsz**3
    cin = dense_flat.shape[1]
    halo = (ksz - 1) // 2
    dense2 = dense_flat.reshape(r, b3 * cin)
    hal = _halo_expand_flat(dense2, nbr_ext, bsz, halo, cin)
    return tap_conv(hal, weight, bsz, ksz, cin)


def _fused_conv_fwd(dense_flat, nbr_ext, weight, bsz, ksz, compute_dtype):
    out = _fused_conv(dense_flat, nbr_ext, weight, bsz, ksz, compute_dtype)
    return out, (dense_flat, nbr_ext, weight)


def _fused_conv_bwd(bsz, ksz, compute_dtype, res, g):
    from pointcept_tpu.ops.pallas.tap_conv import tap_conv, tap_conv_dw

    dense_flat, nbr_ext, weight = res
    r = nbr_ext.shape[0]
    b3 = bsz**3
    cin = dense_flat.shape[1]
    cout = weight.shape[-1]
    k3 = ksz**3
    halo = (ksz - 1) // 2
    g = g.astype(compute_dtype)
    # d_dense[p] = sum_d g[p + d - h] w[k-1-d]^T: same halo-expand + kernel on
    # the cotangent tiles with index-reversed, channel-transposed weight
    ghalo = _halo_expand_flat(g.reshape(r, b3 * cout), nbr_ext, bsz, halo, cout)
    wflip = weight[::-1].transpose(0, 2, 1)  # [k^3, Cout, Cin], index-reversed
    d_dense = tap_conv(ghalo, wflip, bsz, ksz, cout).astype(dense_flat.dtype)
    # dW: recompute the forward halo (gathers are cheap; saving it would cost
    # 3.4x the dense tensor in HBM across every conv of the step)
    hal = _halo_expand_flat(
        dense_flat.reshape(r, b3 * cin).astype(compute_dtype), nbr_ext, bsz, halo, cin
    )
    dw = tap_conv_dw(hal, g, bsz, ksz, cin).astype(weight.dtype)
    d_nbr = np.zeros(nbr_ext.shape, jax.dtypes.float0)
    return (d_dense, d_nbr, dw)


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def _slab(a: int, bsz: int, halo: int):
    """Source x-range within the neighbor block at offset a for the halo tile."""
    if a == -1:
        return bsz - halo, bsz
    if a == 0:
        return 0, bsz
    return 0, halo


def _halo_expand(dense: jnp.ndarray, nbr: jnp.ndarray, halo: int) -> jnp.ndarray:
    """[nB+1, B, B, B, C] (row nB = zero block) -> [nB+1, B+2h, B+2h, B+2h, C].

    Exact 27-region assembly: each region is a static slice of the dense tensor
    gathered at the corresponding neighbor rank — diagonal regions read the
    diagonal block directly, so occupancy gaps in face neighbors don't lose
    contributions.

    The trailing zero block is KEPT (its halo row in `nbr` points at itself, so
    its tile stays all-zero through the conv): slicing it off costs a full copy
    of the dense tensor (~1.3 ms/conv at full resolution, profiled), while
    convolving one extra block costs nB⁻¹ extra FLOPs."""
    if halo == 0:
        return dense
    bsz = dense.shape[1]
    pieces_x = []
    for a in (-1, 0, 1):
        x0, x1 = _slab(a, bsz, halo)
        pieces_y = []
        for b in (-1, 0, 1):
            y0, y1 = _slab(b, bsz, halo)
            pieces_z = []
            for c in (-1, 0, 1):
                z0, z1 = _slab(c, bsz, halo)
                if (a, b, c) == (0, 0, 0):
                    # center = self: invalid blocks hold zeros anyway, skip the gather
                    pieces_z.append(dense)
                    continue
                k = OFFS27.index((a, b, c))
                sub = dense[:, x0:x1, y0:y1, z0:z1, :]  # static slice (cheap)
                # gather FLATTENED rows: a multi-dim row gather lets XLA pick
                # a block-minor layout whose gather crosses lanes (~6x slower
                # measured for the k5 stem, exp/stem_variants.py); row-major
                # [nB, x*y*z*c] keeps it a streaming row gather
                shp = sub.shape
                src = jnp.take(sub.reshape(shp[0], -1), nbr[:, k], axis=0)
                pieces_z.append(src.reshape(shp))
            pieces_y.append(jnp.concatenate(pieces_z, axis=3))
        pieces_x.append(jnp.concatenate(pieces_y, axis=2))
    return jnp.concatenate(pieces_x, axis=1)


def block_subm_conv(
    feat: jnp.ndarray,  # [N, Cin]
    tables: dict,
    weight: jnp.ndarray,  # [k^3, Cin, Cout] (kernel_offsets C-order)
    bias: Optional[jnp.ndarray] = None,
    kernel_size: int = 3,
    block_bits: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Submanifold sparse conv via dense blocks; numerically equivalent to
    ops/sparse_conv.gather_conv over the same inputs (bf16 rounding aside)."""
    if block_bits is None:
        block_bits = tables.get("block_bits", 3)
    slot, nbr = tables["slot"], tables["nbr"]
    nb = nbr.shape[0]
    n = slot.shape[0]
    bsz = 1 << block_bits
    b3 = bsz**3
    halo = (kernel_size - 1) // 2
    assert halo <= bsz, "kernel halo exceeds block size"
    cin = feat.shape[1]
    cout = weight.shape[-1]

    # dense fill: Pallas one-hot MXU placement; no scatters anywhere. The
    # kernel emits the trailing all-zero block halo expansion gathers for
    # missing neighbors
    dense = _block_fill(
        feat, tables["rc_sorted"], tables["fill_start"],
        (tables["slot"], tables["order0"], tables["inverse0"]), b3, compute_dtype,
        tables.get("identity_order0", False),
    )
    # grouped fills emit ceil((nb+1)/G)*G tiles (trailing ones all-zero)
    nrows = dense.shape[0] // b3
    dense = dense.reshape(nrows, bsz, bsz, bsz, cin)

    # the zero block participates as block nb (and any grouped-fill padding
    # tiles behave the same): neighbors point at nb (itself/zero) so those
    # tiles stay zero through the conv, and the padding/overflow slot nb*b3
    # reads a true zero — no trash-slice, no take-back mask
    nbr_ext = jnp.concatenate(
        [nbr, jnp.full((nrows - nb, nbr.shape[1]), nb, jnp.int32)], axis=0
    )
    import os as _os

    # engine default: lax.conv everywhere — the r4 A/B on the bench TPU
    # measured the fused Pallas tap-conv at 8.2 scenes/s end-to-end vs 10.5
    # for lax.conv (docs/ab_results.jsonl; the r3 fused default was the
    # 10.977 -> 8.698 regression). BLOCK_CONV_FUSED=1 forces the fused path
    # (parity-tested in tests/test_tap_conv.py); BLOCK_CONV_LAX=1 forces lax.
    use_lax = True
    if _os.environ.get("BLOCK_CONV_FUSED", "0") == "1":
        use_lax = False
    if _os.environ.get("BLOCK_CONV_LAX", "0") == "1":
        use_lax = True

    # 2-D banded formulation (BLOCK_CONV_2D=1): z folds into lanes. The 3-D
    # lax.conv brackets every conv with 5-D NDHWC layout copies (~10 ms/conv
    # at full res, 22% of the r4 step profile) and tiles C=64 lanes at
    # T(4,128) half-waste. Instead: halo tiles stay the flat row-major
    # [R, H, H, H*Cin] (free reshapes of `_halo_expand_flat` output), the
    # banded weight `pack_w2` [k^2, H*Cin, b*Cout] applies all k^3 taps as a
    # 2-D VALID NHWC conv — no 5-D tensor exists, lanes are >=256 wide, and
    # the z-band's zero rows cost H/k extra MXU FLOPs (~2x of a 5% MFU
    # workload — free). Falls back to 3-D lax where the banded weight
    # exceeds the VMEM-friendly cap (C>=128 stages).
    hsz = bsz + 2 * halo
    banded_bytes = (
        kernel_size * kernel_size * hsz * cin * bsz * cout * jnp.dtype(compute_dtype).itemsize
    )
    use_2d = (
        _os.environ.get("BLOCK_CONV_2D", "0") == "1"
        and halo > 0
        and banded_bytes <= 4 * 2**20
    )
    # BLOCK_CONV_FLAT3D=1: assemble the halo with the FLAT row-major concat
    # chain (no 5-D tensors in the assembly) and feed lax.conv through a pure
    # bitcast reshape — probes whether the four differently-permuted ~305 MB
    # copies of the 5-D assembly (r5 trace) beat the flat concat costs
    if not use_2d and halo > 0 and _os.environ.get("BLOCK_CONV_FLAT3D", "0") == "1":
        hal2 = _halo_expand_flat(
            dense.reshape(nrows, b3 * cin), nbr_ext, bsz, halo, cin
        )
        hal = hal2.reshape(nrows, hsz, hsz, hsz, cin)
        w = weight.reshape(kernel_size, kernel_size, kernel_size, cin, cout).astype(compute_dtype)
        out = jax.lax.conv_general_dilated(
            hal, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = out.reshape(nrows * b3, cout)
    elif use_2d:
        from pointcept_tpu.ops.pallas.tap_conv import pack_w2

        hal2 = _halo_expand_flat(
            dense.reshape(nrows, b3 * cin), nbr_ext, bsz, halo, cin
        )  # [R, H^3*Cin], rows (g), lanes (x, y, z, c) raster
        wb = pack_w2(weight, bsz, kernel_size, compute_dtype)  # [k^2*H*Cin, b*Cout]
        out = jax.lax.conv_general_dilated(
            hal2.reshape(nrows, hsz, hsz, hsz * cin),
            wb.reshape(kernel_size, kernel_size, hsz * cin, bsz * cout),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [R, b, b, b*Cout] -> rows (g, ox, oy), lanes (oz, co): raster order
        out = out.reshape(nrows * b3, cout)
    elif use_lax:
        # legacy lax.conv path (kept for A/B benchmarking; the fused Pallas
        # path below is numerically equivalent and avoids the NDHWC layout
        # copies that bracketed every conv — see ops/pallas/tap_conv.py)
        hal = _halo_expand(dense, nbr_ext, halo)  # [nb+1, B+2h, ..., cin]
        w = weight.reshape(kernel_size, kernel_size, kernel_size, cin, cout).astype(compute_dtype)
        # bf16 in/out: the TPU conv accumulates f32 internally; keeping operand
        # and output dtypes equal avoids the mixed-dtype conv-VJP limitation
        out = jax.lax.conv_general_dilated(
            hal,
            w,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # [nb+1, B, B, B, cout]
        out = out.reshape(nrows * b3, cout)
    else:
        out = _fused_conv(
            dense.reshape(nrows * b3, cin), nbr_ext, weight, bsz, kernel_size, compute_dtype
        )  # [nrows*b3, cout]
    # keep the dense tensor in compute dtype through the take-back: the conv
    # writes (and the layout copies + row gather move) HALF the bytes; the
    # f32 upcast happens on the compact [N, Cout] result where it fuses into
    # the following norm (profiled: f32 conv output cost ~3 ms/conv extra at
    # full resolution)
    res = _take_back(
        out.reshape(nrows * b3, cout),
        tables["rc_sorted"], tables["fill_start"],
        (tables["slot"], tables["order0"], tables["inverse0"]),
        bsz, compute_dtype, tables.get("identity_order0", False),
    )
    res = res.astype(feat.dtype)
    if bias is not None:
        res = res + bias
    return res


@_partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _take_back(out, rc_sorted, starts, slot_order, bsz: int, compute_dtype, identity: bool = False):
    """Dense conv output -> per-point rows: the inverse of `_block_fill`.

    Forward: row gather at `slot` (with the zfold widening trick for narrow
    cout — sub-64-lane row gathers run ~2.5x slower per row, profiled).
    Backward: the cotangent "scatter to slots" IS a block fill of g — the
    Pallas one-hot kernel at ~3.5 ms instead of XLA's serializing scatter-add
    (70 ms per full-res conv in the r5 train-step trace)."""
    slot = slot_order[0]
    b3 = bsz**3
    n = slot.shape[0]
    cout = out.shape[1]
    total = out.shape[0]
    # take-back gather: every slot (incl. the nb*b3 trash slot) is in range.
    # For narrow cout, XLA stores the row-gather chain row-minor ({0,1}) to
    # avoid lane padding, which turns the gather into a 13.7 ms lane-crossing
    # one (vs 3.8 ms for 64-wide rows, profiled at full res). Folding z-slots
    # into the row widens it to >=64 lanes — the z-slice is then selected with
    # a fused one-hot contraction. pin_rowmajor (a fixed-layout Pallas
    # identity) keeps consumers from flipping the layout back.
    from pointcept_tpu.ops.pallas.layout_pin import pin_rowmajor

    zfold = 1
    while cout * zfold < 64 and zfold < bsz and bsz % (zfold * 2) == 0:
        zfold *= 2
    if zfold > 1:
        out4 = out.reshape(total // zfold, zfold * cout)
        g = pin_rowmajor(jnp.take(out4, slot // zfold, axis=0))
        sel = jax.nn.one_hot(slot % zfold, zfold, dtype=g.dtype)
        return jnp.einsum("nzc,nz->nc", g.reshape(n, zfold, cout), sel)
    return pin_rowmajor(jnp.take(out, slot, axis=0))


def _take_back_fwd(out, rc_sorted, starts, slot_order, bsz, compute_dtype, identity):
    res = _take_back(out, rc_sorted, starts, slot_order, bsz, compute_dtype, identity)
    return res, (rc_sorted, starts, slot_order, jnp.zeros((0,), out.dtype))


def _take_back_bwd(bsz, compute_dtype, identity, res_data, g):
    # d_out: each valid point's cotangent lands in its unique dense slot —
    # exactly the fill (overflow/padding rows read the zero trash row in the
    # forward, so dropping their grads matches jnp.take's VJP observably)
    rc_sorted, starts, slot_order, dtype_witness = res_data
    b3 = bsz**3
    # the fill's (grouped) output row count equals the conv output's row count
    # by construction — `out` IS a conv over a _block_fill result
    d_out = _block_fill(g, rc_sorted, starts, slot_order, b3, compute_dtype, identity)
    d_out = d_out.astype(dtype_witness.dtype)
    z1 = np.zeros(rc_sorted.shape, jax.dtypes.float0)
    zm = np.zeros(starts.shape, jax.dtypes.float0)
    zs = np.zeros(slot_order[0].shape, jax.dtypes.float0)
    return (d_out, z1, zm, (zs, zs, zs))


_take_back.defvjp(_take_back_fwd, _take_back_bwd)


def default_block_capacity(capacity: int, factor: float = 1.0 / 16.0, multiple: int = 128) -> int:
    """Static bound on occupied 8^3 blocks. Indoor surface scans occupy ~N/64;
    factor 1/16 gives 4x margin (overflow blocks output zeros)."""
    m = max(int(np.ceil(capacity * factor)), multiple)
    return ((m + multiple - 1) // multiple) * multiple
