"""Host geometry engine (native/geometry.cpp) vs the in-graph builders.

The C++ engine must reproduce ops/serialization.py argsorts,
ops/sparse_conv.py SubM neighbor maps, PointBatch.patch_partition and
SerializedPooling's cluster construction exactly — the full-model test checks
bit-identical logits between the two paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.ops import host_geometry as hg
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.sparse_conv import build_subm_neighbor_map

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _scenes(rng, counts, cap, depth):
    grid = np.zeros((cap, 3), np.int32)
    batch = np.full(cap, -1, np.int32)
    pos = 0
    for b, n in enumerate(counts):
        seen, out = set(), []
        while len(out) < n:
            v = tuple(rng.randint(0, 1 << depth, 3))
            if v not in seen:
                seen.add(v)
                out.append(v)
        grid[pos : pos + n] = np.array(out, np.int32)
        batch[pos : pos + n] = b
        pos += n
    return grid, batch


def test_serialize_orders_parity(rng):
    depth = 9
    grid, batch = _scenes(rng, [400, 300], 1024, depth)
    ho, hi = hg.serialize_orders(grid, batch, depth, ORDERS)
    kb = jnp.where(jnp.asarray(batch) >= 0, jnp.asarray(batch), ser.BATCH_SENTINEL)
    keys = ser.encode_all(jnp.asarray(grid), kb, depth, ORDERS)
    nvalid = 700
    for i in range(4):
        do = np.asarray(ser.argsort_keys(keys[i]))
        dinv = np.asarray(ser.invert_order(jnp.asarray(do)))
        # padding tie order is unspecified; compare the valid prefix / valid points
        assert (ho[i, :nvalid] == do[:nvalid]).all()
        assert (hi[i][batch >= 0] == dinv[batch >= 0]).all()


@pytest.mark.parametrize("kernel", [3, 5])
def test_subm_map_parity(rng, kernel):
    depth = 8
    grid, batch = _scenes(rng, [500, 200], 1024, depth)
    hm = hg.subm_map(grid, batch, depth, kernel)
    kb = jnp.where(jnp.asarray(batch) >= 0, jnp.asarray(batch), ser.BATCH_SENTINEL).astype(jnp.int32)
    dm = np.asarray(
        build_subm_neighbor_map(jnp.asarray(grid), kb, jnp.asarray(batch) >= 0, depth, kernel)
    )
    assert (hm == dm).all()


def _model_and_inputs(rng, shuffle=False):
    from pointcept_tpu.models import build_model
    from pointcept_tpu.engines.train import make_point_batch

    depth, cap, B = 9, 1536, 2
    grid, batch = _scenes(rng, [700, 500], cap, depth)
    coord = grid.astype(np.float32) * 0.02
    feat = rng.randn(cap, 6).astype(np.float32)
    seg = rng.randint(0, 13, cap).astype(np.int32)
    seg[batch < 0] = -1
    bb = dict(
        type="PT-v3m1", in_channels=6, order=ORDERS, stride=(2, 2),
        enc_depths=(1, 1, 1), enc_channels=(16, 32, 64), enc_num_head=(2, 4, 8),
        enc_patch_size=(64, 64, 64), dec_depths=(1, 1), dec_channels=(16, 32),
        dec_num_head=(2, 4), dec_patch_size=(64, 64), mlp_ratio=2, drop_path=0.0,
        serialize_depth=depth, pool_capacity_factors=(0.5, 0.5), shuffle_orders=shuffle,
    )
    model = build_model(
        dict(
            type="DefaultSegmentorV2", num_classes=13, backbone_out_channels=16,
            backbone=bb,
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        )
    )
    arrays = dict(coord=coord, grid_coord=grid, batch=batch, feat=feat, segment=seg)
    pb_dev = make_point_batch({k: jnp.asarray(v) for k, v in arrays.items()}, B)
    plan = hg.ptv3_plan(bb, cap, B)
    geo = hg.geometry_arrays(plan, arrays, shuffle_seed=0)
    pb_host = make_point_batch({k: jnp.asarray(v) for k, v in {**arrays, **geo}.items()}, B)
    return model, pb_dev, pb_host, batch


def test_full_model_host_geometry_parity(rng):
    model, pb_dev, pb_host, batch = _model_and_inputs(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb_dev, train=False)
    out_dev = model.apply(variables, pb_dev, train=False)
    out_host = model.apply(variables, pb_host, train=False)
    d = np.abs(np.asarray(out_dev["seg_logits"]) - np.asarray(out_host["seg_logits"]))
    assert d[batch >= 0].max() < 1e-5
    np.testing.assert_allclose(float(out_dev["loss"]), float(out_host["loss"]), rtol=1e-5)


def test_host_geometry_grad_and_shuffle(rng):
    """Host-geometry path must be differentiable and support shuffled orders."""
    from pointcept_tpu.models import build_model
    from pointcept_tpu.engines.train import make_point_batch

    model, pb_dev, pb_host, batch = _model_and_inputs(rng, shuffle=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)}, pb_dev, train=False
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            pb_host,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(2), "shuffle": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return out["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_geometry_arrays_without_grid(rng):
    """grid_coord derived host-side must match PointBatch.with_grid_coord."""
    from pointcept_tpu.models.utils.structure import PointBatch

    cap, B = 512, 2
    coord = rng.rand(cap, 3).astype(np.float32) * 4
    batch = np.full(cap, -1, np.int32)
    batch[:300] = 0
    batch[300:450] = 1
    plan = dict(
        num_scenes=B, depth=9, orders=ORDERS, stage_caps=[cap, 256], patch_sizes=(64, 64),
        strides=(2,), stem_kernel=5, grid_size=0.05, shuffle=False,
    )
    geo = hg.geometry_arrays(plan, dict(coord=coord, batch=batch))
    pb = PointBatch(
        coord=jnp.asarray(coord), feat=None, grid_coord=None, batch=jnp.asarray(batch), num_scenes=B
    ).with_grid_coord(0.05)
    hm = hg.subm_map(np.asarray(pb.grid_coord), batch, 9, 5)
    assert (geo["geo_nbr_stem"] == hm).all()
