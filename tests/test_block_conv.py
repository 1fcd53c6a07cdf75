"""Block-dense submanifold conv (ops/block_conv.py) vs gather-GEMM reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.block_conv import (
    OFFS27,
    block_subm_conv,
    build_block_tables,
    default_block_capacity,
)
from pointcept_tpu.ops.sparse_conv import build_subm_neighbor_map, gather_conv, kernel_offsets


def _mixed_scene(rng, cap=2048, depth=9):
    """Two scenes with scattered + clustered (surface-like) voxels, deduped."""
    def scatter(n):
        seen, out = set(), []
        while len(out) < n:
            v = tuple(rng.randint(0, 1 << depth, 3))
            if v not in seen:
                seen.add(v)
                out.append(v)
        return np.array(out, np.int32)

    n1 = min(700, int(cap * 0.35))
    n2 = min(500, int(cap * 0.25))
    n3 = min(500, int(cap * 0.25))
    grid = np.zeros((cap, 3), np.int32)
    batch = np.full(cap, -1, np.int32)
    grid[:n1] = scatter(n1)
    grid[n1 : n1 + n2] = scatter(n2)
    batch[:n1] = 0
    batch[n1 : n1 + n2] = 1
    base = rng.randint(0, (1 << depth) - 16, 3)
    grid[n1 + n2 : n1 + n2 + n3] = base + rng.randint(0, 16, (n3, 3))
    batch[n1 + n2 : n1 + n2 + n3] = 0
    key = (grid[:, 0].astype(np.int64) << 40) | (grid[:, 1].astype(np.int64) << 20) | grid[:, 2]
    key = np.where(batch >= 0, key + batch.astype(np.int64) * (1 << 60), -np.arange(cap, dtype=np.int64))
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(cap, bool)
    keep[first] = True
    batch = np.where(keep, batch, -1)
    return grid, batch


@pytest.mark.parametrize("kernel", [3, 5])
@pytest.mark.parametrize("block_bits", [2, 3])
def test_block_conv_matches_gather_conv(rng, kernel, block_bits):
    depth, cap = 9, 2048
    grid, batch = _mixed_scene(rng, cap, depth)
    feat = rng.randn(cap, 16).astype(np.float32)
    gj, bj = jnp.asarray(grid), jnp.asarray(batch)
    kb = jnp.where(bj >= 0, bj, ser.BATCH_SENTINEL).astype(jnp.int32)
    mask = bj >= 0
    keys0 = ser.encode(gj, kb, depth, "z")
    order0 = ser.argsort_keys(keys0)

    nbr = build_subm_neighbor_map(gj, kb, mask, depth, kernel)
    w = jnp.asarray(rng.randn(kernel**3, 16, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    # f32 compute: the comparison must be exact (block layout vs gather layout)
    ref = gather_conv(jnp.asarray(feat), nbr, w, b, compute_dtype=jnp.float32)
    tables = build_block_tables(keys0, order0, gj, mask, depth, cap, block_bits)
    got = block_subm_conv(jnp.asarray(feat), tables, w, b, kernel_size=kernel, compute_dtype=jnp.float32)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m], rtol=2e-4, atol=2e-4)


def test_block_conv_grad_matches_gather_grad(rng):
    """VJP through the (grouped) fill matches the gather engine's gradient —
    incl. at block_bits=2 where the fill batches 8 blocks per grid cell."""
    depth, cap = 9, 1024
    grid, batch = _mixed_scene(rng, cap, depth)
    feat = rng.randn(cap, 8).astype(np.float32)
    gj, bj = jnp.asarray(grid), jnp.asarray(batch)
    kb = jnp.where(bj >= 0, bj, ser.BATCH_SENTINEL).astype(jnp.int32)
    mask = bj >= 0
    keys0 = ser.encode(gj, kb, depth, "z")
    order0 = ser.argsort_keys(keys0)
    w = jnp.asarray(rng.randn(27, 8, 4).astype(np.float32) * 0.1)
    nbr = build_subm_neighbor_map(gj, kb, mask, depth, 3)
    cot = jnp.asarray(rng.randn(cap, 4).astype(np.float32))

    def loss_ref(f):
        return jnp.sum(gather_conv(f, nbr, w, None, compute_dtype=jnp.float32) * cot)

    gref = jax.grad(loss_ref)(jnp.asarray(feat))
    for bb in (2, 3):
        t = build_block_tables(keys0, order0, gj, mask, depth, cap, bb)

        def loss_blk(f):
            return jnp.sum(
                block_subm_conv(f, t, w, None, kernel_size=3, compute_dtype=jnp.float32) * cot
            )

        gblk = jax.grad(loss_blk)(jnp.asarray(feat))
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(gblk)[m], np.asarray(gref)[m], rtol=2e-4, atol=2e-4)


def test_block_tables_structure(rng):
    depth, cap = 8, 1024
    grid, batch = _mixed_scene(rng, cap, depth)
    gj, bj = jnp.asarray(grid), jnp.asarray(batch)
    kb = jnp.where(bj >= 0, bj, ser.BATCH_SENTINEL).astype(jnp.int32)
    keys0 = ser.encode(gj, kb, depth, "z")
    order0 = ser.argsort_keys(keys0)
    m = cap
    t = build_block_tables(keys0, order0, gj, bj >= 0, depth, m, 3)
    slot = np.asarray(t["slot"])
    nbr = np.asarray(t["nbr"])
    bg = np.asarray(t["block_grid"])
    valid = np.asarray(bj >= 0)
    # each valid point lands in the block of its coarse voxel
    rank = slot[valid] // 512
    assert (rank < m).all()
    assert (bg[rank] == (grid[valid] >> 3)).all()
    # local raster offset matches grid low bits
    local = slot[valid] % 512
    lx, ly, lz = local >> 6, (local >> 3) & 7, local & 7
    assert (np.stack([lx, ly, lz], 1) == (grid[valid] & 7)).all()
    # neighbor links are geometrically consistent
    center = OFFS27.index((0, 0, 0))
    occupied = sorted(set(rank.tolist()))
    for r in occupied[:50]:
        for k, off in enumerate(OFFS27):
            j = nbr[r, k]
            if j < m and k != center:
                assert (bg[j] == bg[r] + np.asarray(off)).all()


def test_block_conv_padding_rows_zero(rng):
    depth, cap = 8, 512
    grid, batch = _mixed_scene(rng, cap, depth)
    feat = rng.randn(cap, 8).astype(np.float32)
    gj, bj = jnp.asarray(grid), jnp.asarray(batch)
    kb = jnp.where(bj >= 0, bj, ser.BATCH_SENTINEL).astype(jnp.int32)
    keys0 = ser.encode(gj, kb, depth, "z")
    order0 = ser.argsort_keys(keys0)
    t = build_block_tables(keys0, order0, gj, bj >= 0, depth, cap, 3)
    w = jnp.asarray(rng.randn(27, 8, 4).astype(np.float32))
    out = np.asarray(block_subm_conv(jnp.asarray(feat), t, w, None, kernel_size=3, compute_dtype=jnp.float32))
    pad = ~np.asarray(bj >= 0)
    assert np.abs(out[pad]).max() == 0


def test_default_block_capacity():
    assert default_block_capacity(102400) == 6400
    assert default_block_capacity(100) == 128
