import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.ops.segment_ops import segment_reduce, masked_segment_reduce
from pointcept_tpu.ops.attention import patch_attention
from pointcept_tpu.ops.sparse_conv import (
    SortedVoxelIndex,
    build_subm_neighbor_map,
    build_strided_maps,
    gather_conv,
    inverse_conv,
    kernel_offsets,
)
from pointcept_tpu.ops import serialization as ser


def test_segment_reduce_basic():
    data = jnp.asarray([[1.0], [2.0], [3.0], [10.0]])
    ids = jnp.asarray([0, 0, 1, 5])  # 5 out of range -> dropped
    out = segment_reduce(data, ids, 3, "sum")
    np.testing.assert_allclose(np.asarray(out).ravel(), [3, 3, 0])
    out = segment_reduce(data, ids, 3, "mean")
    np.testing.assert_allclose(np.asarray(out).ravel(), [1.5, 3, 0])
    out = segment_reduce(data, ids, 3, "max")
    np.testing.assert_allclose(np.asarray(out).ravel(), [2, 3, 0])


def test_patch_attention_matches_numpy_softmax():
    rng = np.random.RandomState(0)
    n, c, h, k = 64, 16, 4, 16
    qkv = rng.randn(n, 3 * c).astype(np.float32)
    # identity partition: single scene, n == multiple of k, no padding
    slot_to_point = np.arange(n, dtype=np.int32)
    point_to_slot = np.arange(n, dtype=np.int32)
    out = patch_attention(
        jnp.asarray(qkv),
        jnp.asarray(slot_to_point),
        jnp.asarray(point_to_slot),
        num_heads=h,
        patch_size=k,
        compute_dtype=jnp.float32,
        use_pallas=False,
    )
    d = c // h
    q, kk, v = qkv.reshape(n, 3, h, d).transpose(1, 0, 2, 3)
    expect = np.zeros((n, h, d), np.float32)
    scale = d**-0.5
    for p in range(n // k):
        sl = slice(p * k, (p + 1) * k)
        for hh in range(h):
            att = (q[sl, hh] * scale) @ kk[sl, hh].T
            att = np.exp(att - att.max(-1, keepdims=True))
            att /= att.sum(-1, keepdims=True)
            expect[sl, hh] = att @ v[sl, hh]
    np.testing.assert_allclose(np.asarray(out), expect.reshape(n, c), atol=1e-5)


def test_voxel_index_lookup():
    rng = np.random.RandomState(1)
    n = 500
    grid = rng.randint(0, 64, size=(n, 3)).astype(np.int32)
    batch = rng.randint(0, 3, size=n).astype(np.int32)
    # dedupe (voxel grid should be unique per batch)
    key = batch * 64**3 + grid[:, 0] * 64**2 + grid[:, 1] * 64 + grid[:, 2]
    _, uidx = np.unique(key, return_index=True)
    grid, batch = grid[uidx], batch[uidx]
    n = len(grid)
    idx = SortedVoxelIndex.build(jnp.asarray(grid), jnp.asarray(batch), 8)
    # every voxel finds itself
    res = np.asarray(idx.lookup(jnp.asarray(grid), jnp.asarray(batch)))
    np.testing.assert_array_equal(res, np.arange(n))
    # missing voxels return -1
    missing = grid.copy()
    missing[:, 0] = 100  # out of occupied range
    res = np.asarray(idx.lookup(jnp.asarray(missing), jnp.asarray(batch)))
    assert (res == -1).all()


def test_subm_neighbor_map_matches_bruteforce():
    rng = np.random.RandomState(2)
    n_valid, cap = 80, 96
    grid = np.zeros((cap, 3), np.int32)
    grid[:n_valid] = rng.randint(0, 10, size=(n_valid, 3))
    batch = np.full(cap, -1, np.int32)
    batch[:n_valid] = rng.randint(0, 2, size=n_valid)
    # dedupe within batch
    key = batch[:n_valid] * 10**3 + grid[:n_valid, 0] * 100 + grid[:n_valid, 1] * 10 + grid[:n_valid, 2]
    _, uidx = np.unique(key, return_index=True)
    n_valid = len(uidx)
    g2 = np.zeros((cap, 3), np.int32)
    b2 = np.full(cap, -1, np.int32)
    g2[:n_valid] = grid[uidx]
    b2[:n_valid] = batch[uidx]
    mask = b2 >= 0
    kb = np.where(mask, b2, int(ser.BATCH_SENTINEL)).astype(np.int32)

    nbr = np.asarray(
        build_subm_neighbor_map(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 8, 3)
    )
    nbr_bs = np.asarray(
        build_subm_neighbor_map(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 8, 3, method="bsearch")
    )
    np.testing.assert_array_equal(nbr, nbr_bs)
    offs = kernel_offsets(3)
    lut = {(int(b2[i]), *g2[i].tolist()): i for i in range(n_valid)}
    for i in range(n_valid):
        for j, o in enumerate(offs):
            q = (int(b2[i]), *(g2[i] + o).tolist())
            expect = lut.get(q, -1)
            assert nbr[i, j] == expect, (i, j, o, nbr[i, j], expect)
    # padding rows have no neighbors except none
    assert (nbr[~mask] == -1).all()


def test_gather_conv_fuse_equals_loop():
    rng = np.random.RandomState(3)
    n, k, cin, cout = 50, 27, 8, 12
    feat = jnp.asarray(rng.randn(n, cin).astype(np.float32))
    nbr = jnp.asarray(rng.randint(-1, n, size=(n, k)).astype(np.int32))
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    out1 = gather_conv(feat, nbr, w, b, fuse=True)
    out2 = gather_conv(feat, nbr, w, b, fuse=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_strided_maps_roundtrip():
    rng = np.random.RandomState(4)
    cap = 64
    n_valid = 40
    grid = np.zeros((cap, 3), np.int32)
    grid[:n_valid] = rng.randint(0, 16, size=(n_valid, 3))
    batch = np.full(cap, -1, np.int32)
    batch[:n_valid] = 0
    key = grid[:n_valid, 0] * 256 + grid[:n_valid, 1] * 16 + grid[:n_valid, 2]
    _, uidx = np.unique(key, return_index=True)
    n_valid = len(uidx)
    g2 = np.zeros((cap, 3), np.int32)
    b2 = np.full(cap, -1, np.int32)
    g2[:n_valid] = grid[uidx]
    b2[:n_valid] = 0
    mask = b2 >= 0
    kb = np.where(mask, b2, int(ser.BATCH_SENTINEL)).astype(np.int32)

    m = 64
    out_grid, out_batch, child, parent_of, child_slot = [
        np.asarray(x)
        for x in build_strided_maps(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 4, m)
    ]
    n_clusters = (out_batch >= 0).sum()
    expect_clusters = len(np.unique((g2[:n_valid] >> 1) @ np.array([64, 8, 1])))
    assert n_clusters == expect_clusters
    # each valid point's parent exists and its coarse grid matches
    for i in range(n_valid):
        p = parent_of[i]
        assert p < m
        np.testing.assert_array_equal(out_grid[p], g2[i] >> 1)
        # child table round trip
        assert child[p, child_slot[i]] == i
    # inverse conv reaches every fine point
    cin, cout = 4, 6
    feat_c = jnp.asarray(rng.randn(m, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32))
    out = np.asarray(inverse_conv(feat_c, jnp.asarray(parent_of), jnp.asarray(child_slot), w))
    for i in range(n_valid):
        expect = np.asarray(feat_c)[parent_of[i]] @ np.asarray(w)[child_slot[i]]
        np.testing.assert_allclose(out[i], expect, atol=1e-5)
    assert (out[~mask] == 0).all()


def test_losses():
    from pointcept_tpu.models.losses import build_criteria

    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(100, 5).astype(np.float32))
    target = jnp.asarray(np.concatenate([rng.randint(0, 5, 80), np.full(20, -1)]).astype(np.int32))
    crit = build_criteria([
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ])
    loss = crit(logits, target)
    assert np.isfinite(float(loss))
    # CE alone matches manual computation
    ce = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])(logits, target)
    lp = jax.nn.log_softmax(logits, -1)
    t = np.asarray(target)
    manual = -np.asarray(lp)[np.arange(100)[t >= 0], t[t >= 0]].mean()
    np.testing.assert_allclose(float(ce), manual, rtol=1e-5)
    # fully ignored target gives finite loss
    all_ignored = jnp.full((100,), -1, jnp.int32)
    assert np.isfinite(float(crit(logits, all_ignored)))


def test_fused_neighbor_maps_match_single_stage():
    from pointcept_tpu.ops.sparse_conv import build_fused_neighbor_maps

    rng = np.random.RandomState(7)
    specs = []
    singles = []
    for si, (n_valid, cap, extent, k) in enumerate([(80, 96, 10, 3), (50, 64, 6, 5), (30, 32, 4, 3)]):
        grid = np.zeros((cap, 3), np.int32)
        grid[:n_valid] = rng.randint(0, extent, size=(n_valid, 3))
        batch = np.full(cap, -1, np.int32)
        batch[:n_valid] = rng.randint(0, 2, size=n_valid)
        key = batch[:n_valid] * extent**3 + grid[:n_valid, 0] * extent**2 + grid[:n_valid, 1] * extent + grid[:n_valid, 2]
        _, uidx = np.unique(key, return_index=True)
        g2 = np.zeros((cap, 3), np.int32)
        b2 = np.full(cap, -1, np.int32)
        g2[: len(uidx)] = grid[:n_valid][uidx]
        b2[: len(uidx)] = batch[:n_valid][uidx]
        mask = b2 >= 0
        kb = np.where(mask, b2, int(ser.BATCH_SENTINEL)).astype(np.int32)
        specs.append(dict(
            grid_coord=jnp.asarray(g2), key_batch=jnp.asarray(kb), mask=jnp.asarray(mask),
            depth=8, kernel_size=k,
        ))
        singles.append(np.asarray(build_subm_neighbor_map(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 8, k)))

    fused = build_fused_neighbor_maps(specs)
    for f, s in zip(fused, singles):
        np.testing.assert_array_equal(np.asarray(f), s)


def test_k3_columns_of_k5():
    from pointcept_tpu.ops.sparse_conv import k3_columns_of_k5

    rng = np.random.RandomState(3)
    n_valid, cap = 70, 96
    grid = np.zeros((cap, 3), np.int32)
    grid[:n_valid] = rng.randint(0, 8, size=(n_valid, 3))
    batch = np.full(cap, -1, np.int32)
    batch[:n_valid] = 0
    key = grid[:n_valid, 0] * 64 + grid[:n_valid, 1] * 8 + grid[:n_valid, 2]
    _, uidx = np.unique(key, return_index=True)
    g2 = np.zeros((cap, 3), np.int32)
    b2 = np.full(cap, -1, np.int32)
    g2[: len(uidx)] = grid[:n_valid][uidx]
    b2[: len(uidx)] = 0
    b2[len(uidx):] = -1
    mask = b2 >= 0
    kb = np.where(mask, b2, int(ser.BATCH_SENTINEL)).astype(np.int32)
    nbr5 = build_subm_neighbor_map(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 8, 5)
    nbr3 = build_subm_neighbor_map(jnp.asarray(g2), jnp.asarray(kb), jnp.asarray(mask), 8, 3)
    cols = k3_columns_of_k5()
    np.testing.assert_array_equal(np.asarray(nbr5)[:, cols], np.asarray(nbr3))
