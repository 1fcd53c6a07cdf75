import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

from pointcept_tpu.ops import serialization as ser

pytestmark = pytest.mark.quick

GOLDEN = np.load(osp.join(osp.dirname(__file__), "golden", "serialization_golden.npz"))


def _fold(keys, depth):
    return ser.keys_to_int64_np(keys, depth)


@pytest.mark.parametrize("depth", [4, 8, 10, 12, 16])
def test_z_order_matches_reference_golden(depth):
    coords = GOLDEN[f"coords_{depth}"].astype(np.int32)
    batch = np.zeros(len(coords), np.int32)
    keys = np.asarray(ser.encode(jnp.asarray(coords), jnp.asarray(batch), depth, "z"))
    folded = (_fold(keys, depth) & ((1 << (3 * depth)) - 1))
    np.testing.assert_array_equal(folded, GOLDEN[f"z_{depth}"])


@pytest.mark.parametrize("depth", [4, 8, 10, 12, 16])
def test_hilbert_matches_reference_golden(depth):
    coords = GOLDEN[f"coords_{depth}"].astype(np.int32)
    batch = np.zeros(len(coords), np.int32)
    keys = np.asarray(ser.encode(jnp.asarray(coords), jnp.asarray(batch), depth, "hilbert"))
    folded = (_fold(keys, depth) & ((1 << (3 * depth)) - 1))
    np.testing.assert_array_equal(folded, GOLDEN[f"hilbert_{depth}"])


def test_trans_orders_swap_xy():
    coords = jnp.asarray(GOLDEN["coords_10"].astype(np.int32))
    batch = jnp.zeros(len(coords), jnp.int32)
    for base, trans in [("z", "z-trans"), ("hilbert", "hilbert-trans")]:
        swapped = coords[:, jnp.array([1, 0, 2])]
        a = ser.encode(swapped, batch, 10, base)
        b = ser.encode(coords, batch, 10, trans)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_is_primary_sort_key():
    rng = np.random.RandomState(0)
    coords = rng.randint(0, 1 << 10, size=(500, 3)).astype(np.int32)
    batch = rng.randint(0, 4, size=500).astype(np.int32)
    keys = ser.encode(jnp.asarray(coords), jnp.asarray(batch), 10, "z")
    order = np.asarray(ser.argsort_keys(keys))
    sorted_batch = np.asarray(batch)[order]
    assert (np.diff(sorted_batch) >= 0).all()
    # within a batch, codes ascend
    folded = _fold(np.asarray(keys), 10)[order]
    for b in range(4):
        seg = folded[sorted_batch == b]
        assert (np.diff(seg & ((1 << 30) - 1)) >= 0).all()


def test_key_shift_matches_int64_shift():
    rng = np.random.RandomState(1)
    depth = 12
    coords = rng.randint(0, 1 << depth, size=(1000, 3)).astype(np.int32)
    batch = rng.randint(0, 3, size=1000).astype(np.int32)
    keys = ser.encode(jnp.asarray(coords), jnp.asarray(batch), depth, "z")
    for bits in [3, 6, 9]:
        shifted = np.asarray(ser.key_shift_right(keys, bits))
        full = _fold(np.asarray(keys), depth)
        code = full & ((1 << (3 * depth)) - 1)
        expect_code = code >> bits
        got_code = _fold(shifted, depth) & ((1 << (3 * depth)) - 1)
        np.testing.assert_array_equal(got_code, expect_code)
        np.testing.assert_array_equal(shifted[:, 0], np.asarray(batch))


def test_invert_order_roundtrip():
    rng = np.random.RandomState(2)
    order = jnp.asarray(rng.permutation(100).astype(np.int32))
    inverse = ser.invert_order(order)
    np.testing.assert_array_equal(np.asarray(order)[np.asarray(inverse)], np.arange(100))
    np.testing.assert_array_equal(np.asarray(inverse)[np.asarray(order)], np.arange(100))


def test_hilbert_locality_better_than_random():
    # consecutive codes along the curve should be spatially close on average
    rng = np.random.RandomState(3)
    depth = 8
    coords = rng.randint(0, 1 << depth, size=(4000, 3)).astype(np.int32)
    batch = np.zeros(4000, np.int32)
    keys = ser.encode(jnp.asarray(coords), jnp.asarray(batch), depth, "hilbert")
    order = np.asarray(ser.argsort_keys(keys))
    sorted_coords = coords[order].astype(np.float64)
    curve_dist = np.linalg.norm(np.diff(sorted_coords, axis=0), axis=1).mean()
    rand_dist = np.linalg.norm(np.diff(coords.astype(np.float64), axis=0), axis=1).mean()
    assert curve_dist < 0.25 * rand_dist
