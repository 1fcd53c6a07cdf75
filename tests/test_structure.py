import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models.utils.structure import PointBatch, offset2batch


def make_batch(counts, capacity, seed=0, num_classes=5):
    rng = np.random.RandomState(seed)
    B = len(counts)
    n_total = sum(counts)
    assert n_total <= capacity
    coord = rng.rand(capacity, 3).astype(np.float32) * 4.0
    feat = rng.rand(capacity, 6).astype(np.float32)
    grid = np.floor(coord / 0.05).astype(np.int32)
    batch = np.full(capacity, -1, np.int32)
    seg = np.full(capacity, -1, np.int32)
    pos = 0
    for b, c in enumerate(counts):
        batch[pos : pos + c] = b
        seg[pos : pos + c] = rng.randint(0, num_classes, c)
        pos += c
    return PointBatch(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(grid),
        batch=jnp.asarray(batch),
        segment=jnp.asarray(seg),
        num_scenes=B,
    )


def test_scene_counts_and_mask():
    pb = make_batch([100, 50, 30], capacity=256)
    np.testing.assert_array_equal(np.asarray(pb.scene_counts()), [100, 50, 30])
    assert int(pb.num_points) == 180
    assert pb.capacity == 256


def test_serialize_orders_points_by_scene_then_curve():
    pb = make_batch([100, 50, 30], capacity=256).serialize(orders=("z", "hilbert"), depth=8)
    for s in range(2):
        order = np.asarray(pb.serialized_order[s])
        batch_sorted = np.asarray(pb.batch)[order]
        valid = batch_sorted >= 0
        # valid points first, grouped by scene ascending
        assert valid[:180].all() and not valid[180:].any()
        assert (np.diff(batch_sorted[:180]) >= 0).all()
        inverse = np.asarray(pb.serialized_inverse[s])
        np.testing.assert_array_equal(order[inverse], np.arange(256))


def test_patch_partition_roundtrip_and_locality():
    K = 16
    counts = [40, 23, 5, 16]
    pb = make_batch(counts, capacity=128).serialize(orders=("z",), depth=8)
    slot_to_point, point_to_slot = pb.patch_partition(0, K)
    P = pb.padded_capacity(K)
    assert slot_to_point.shape == (P,) and P % K == 0

    s2p = np.asarray(slot_to_point)
    p2s = np.asarray(point_to_slot)
    mask = np.asarray(pb.mask)
    batch = np.asarray(pb.batch)

    # every valid point's own slot maps back to itself
    np.testing.assert_array_equal(s2p[p2s[mask]], np.arange(128)[mask])

    # each live patch contains points from exactly one scene
    padded_counts = [-(-c // K) * K for c in counts]
    total = sum(padded_counts)
    for patch_start in range(0, total, K):
        scenes = set(batch[s2p[patch_start : patch_start + K]].tolist())
        assert len(scenes) == 1 and -1 not in scenes

    # scene boundaries: padded region sizes match ceil(count/K)*K
    q = 0
    for c, pc in zip(counts, padded_counts):
        seg = s2p[q : q + pc]
        # first c slots are the scene's own sorted points (all distinct)
        assert len(set(seg[:c].tolist())) == c
        # tail slots duplicate earlier points of the same scene
        assert (batch[seg] == batch[seg[0]]).all()
        q += pc


def test_patch_partition_small_scene_wraps():
    K = 32
    pb = make_batch([10], capacity=64).serialize(orders=("z",), depth=8)
    slot_to_point, point_to_slot = pb.patch_partition(0, K)
    s2p = np.asarray(slot_to_point)[:K]
    # 10 real points then cyclic repeats
    assert len(set(s2p[:10].tolist())) == 10
    np.testing.assert_array_equal(s2p[10:20], s2p[:10])


def test_offset2batch():
    off = jnp.asarray([3, 5, 9])
    np.testing.assert_array_equal(np.asarray(offset2batch(off)), [0, 0, 0, 1, 1, 2, 2, 2, 2])


def test_serialize_jits():
    pb = make_batch([100, 50], capacity=256)

    @jax.jit
    def f(pb):
        pb = pb.serialize(orders=("z", "z-trans"), depth=8)
        return pb.serialized_order

    o1 = f(pb)
    o2 = pb.serialize(orders=("z", "z-trans"), depth=8).serialized_order
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
