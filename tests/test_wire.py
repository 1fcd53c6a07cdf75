"""Wire-format round trip: packed int32 scene transport (ops/wire.py)."""

import numpy as np
import pytest

from pointcept_tpu.ops.wire import pack_points, unpack_points

pytestmark = pytest.mark.quick


def _collated(capacity=512, eff=400, num_scenes=2, seed=0, grid_max=1000, seg_max=19):
    rng = np.random.default_rng(seed)
    grid = np.zeros((capacity, 3), np.int32)
    grid[:eff] = rng.integers(0, grid_max, (eff, 3))
    batch = np.full((capacity,), -1, np.int32)
    split = eff // 2
    batch[:split] = 0
    batch[split:eff] = num_scenes - 1
    seg = np.full((capacity,), -1, np.int32)
    seg[:eff] = rng.integers(0, seg_max + 1, eff)
    color = np.zeros((capacity, 3), np.float32)
    color[:eff] = rng.integers(0, 256, (eff, 3)).astype(np.float32) / 255.0
    normal = np.zeros((capacity, 3), np.float32)
    normal[:eff] = rng.normal(size=(eff, 3))
    normal[:eff] /= np.linalg.norm(normal[:eff], axis=1, keepdims=True)
    normal[7] = 0.0  # absent normal on a valid row survives exactly
    coord = rng.normal(size=(capacity, 3)).astype(np.float32)
    feat = np.concatenate([color, normal], axis=1).astype(np.float32)
    return dict(coord=coord, feat=feat, grid_coord=grid, batch=batch, segment=seg)


def test_round_trip_lossless_fields():
    arrays = _collated()
    wire = pack_points(arrays)
    assert set(wire) == {"wire_offset", "wire_grid", "wire_cs", "wire_normal"}
    assert all(np.asarray(v).dtype == np.int32 for v in wire.values())
    dec = {k: np.asarray(v) for k, v in unpack_points(wire, grid_size=0.02, num_scenes=2).items()}
    np.testing.assert_array_equal(dec["grid_coord"], arrays["grid_coord"])
    np.testing.assert_array_equal(dec["batch"], arrays["batch"])
    np.testing.assert_array_equal(dec["segment"], arrays["segment"])
    # u8-source colors round-trip exactly
    np.testing.assert_allclose(dec["feat"][:, :3], arrays["feat"][:, :3], atol=1e-7)


def test_normal_octahedral_precision():
    arrays = _collated(eff=512, capacity=512)
    dec = np.asarray(
        unpack_points(pack_points(arrays), grid_size=0.02, num_scenes=2)["feat"]
    )[:, 3:6]
    ref = arrays["feat"][:, 3:6]
    valid = np.linalg.norm(ref, axis=1) > 0.5
    dots = np.clip((dec[valid] * ref[valid]).sum(axis=1), -1, 1)
    assert np.arccos(dots).max() < 1e-3  # f32 arccos near 1 is itself ~3e-4 noisy
    np.testing.assert_array_equal(dec[~valid], 0.0)


def test_coord_reconstruction_and_trash_rows():
    arrays = _collated()
    dec = {k: np.asarray(v) for k, v in unpack_points(pack_points(arrays), grid_size=0.02, num_scenes=2).items()}
    eff = int((arrays["batch"] >= 0).sum())
    np.testing.assert_allclose(dec["coord"][:eff], arrays["grid_coord"][:eff] * 0.02, rtol=1e-6)
    np.testing.assert_array_equal(dec["coord"][eff:], 0.0)
    np.testing.assert_array_equal(dec["feat"][eff:], 0.0)


def test_wide_grid_falls_back_to_unpacked():
    arrays = _collated(grid_max=5000)
    wire = pack_points(arrays)
    assert "wire_grid3" in wire and "wire_grid" not in wire
    dec = unpack_points(wire, grid_size=0.05, num_scenes=2)
    np.testing.assert_array_equal(np.asarray(dec["grid_coord"]), arrays["grid_coord"])


def test_keep_coord_passthrough():
    arrays = _collated()
    wire = pack_points(arrays, keep_coord=True)
    dec = unpack_points(wire, grid_size=0.02, num_scenes=2)
    np.testing.assert_array_equal(np.asarray(dec["coord"]), arrays["coord"])


def test_jit_decode_matches_eager():
    import jax

    arrays = _collated()
    wire = pack_points(arrays)
    eager = unpack_points(wire, grid_size=0.02, num_scenes=2)
    jitted = jax.jit(lambda w: unpack_points(w, grid_size=0.02, num_scenes=2))(wire)
    for k in eager:
        np.testing.assert_allclose(np.asarray(eager[k]), np.asarray(jitted[k]), atol=3e-7)


def test_segment_range_guard():
    arrays = _collated()
    arrays["segment"][0] = 300
    with pytest.raises(ValueError):
        pack_points(arrays)
