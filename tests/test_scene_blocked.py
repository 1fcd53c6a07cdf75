"""Scene-blocked layout (PointBatch.scene_capacity) parity vs the gather path.

The scene-blocked mode keys padding rows to per-scene sort sentinels so every
stage keeps static scene regions; patch attention becomes fixed windows and
pooling/block tables use per-scene ranks. For every valid point the math is
identical to the legacy partition-gather path (same patch membership, same
tail-duplication rule — reference `get_padding_and_inverse`,
`point_transformer_v3m1_base.py:141-158`), so backbone outputs must match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def cfg(scene_blocked, conv_engine="gather", **over):
    c = dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans", "hilbert"),
        stride=(2, 2),
        enc_depths=(2, 2, 2),
        enc_channels=(16, 32, 64),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(128, 128, 128),
        dec_depths=(2, 2),
        dec_channels=(16, 32),
        dec_num_head=(2, 4),
        dec_patch_size=(128, 128),
        mlp_ratio=2,
        drop_path=0.0,
        shuffle_orders=False,
        serialize_depth=8,
        pool_capacity_factors=(0.75, 0.75),
        scene_blocked=scene_blocked,
        conv_engine=conv_engine,
        block_engine_min_points=0,
        block_bits=2,
        # random test scenes occupy ~1 block per point — size capacity so
        # neither the global nor the per-scene split overflows
        block_capacity_factor=1.0,
    )
    c.update(over)
    return c


def _run(pb, model_cfg):
    model = build_model(model_cfg)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, pb, train=False)
    return model.apply(variables, pb, train=False), variables


@pytest.mark.parametrize("engine", ["gather", "block"])
def test_scene_blocked_matches_gather_path(engine):
    pb = make_batch([150, 90], capacity=512, num_classes=5)
    out_ref, v_ref = _run(pb, cfg(False, engine))
    out_sb, v_sb = _run(pb, cfg(True, engine))
    # identical init (same param tree / rng): the layouts must not change params
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_ref["params"], v_sb["params"],
    )
    m = np.asarray(pb.mask)
    a = np.asarray(out_ref.feat)[m]
    b = np.asarray(out_sb.feat)[m]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out_ref.batch), np.asarray(out_sb.batch))


def test_scene_blocked_single_scene():
    pb = make_batch([200], capacity=256, num_classes=5)
    out_ref, _ = _run(pb, cfg(False))
    out_sb, _ = _run(pb, cfg(True))
    m = np.asarray(pb.mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.feat)[m], np.asarray(out_sb.feat)[m], rtol=1e-4, atol=2e-5
    )


def test_scene_blocked_full_scene_no_padding():
    # a scene exactly filling its region exercises the dup-window clamping
    pb = make_batch([256, 100], capacity=512, num_classes=5)
    out_ref, _ = _run(pb, cfg(False))
    out_sb, _ = _run(pb, cfg(True))
    m = np.asarray(pb.mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.feat)[m], np.asarray(out_sb.feat)[m], rtol=1e-4, atol=2e-5
    )


def test_scene_blocked_small_scene_wraps():
    # scene smaller than one patch: first-patch cyclic wrap rule
    pb = make_batch([40, 200], capacity=512, num_classes=5)
    out_ref, _ = _run(pb, cfg(False))
    out_sb, _ = _run(pb, cfg(True))
    m = np.asarray(pb.mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.feat)[m], np.asarray(out_sb.feat)[m], rtol=1e-4, atol=2e-5
    )


def test_scene_blocked_gate_falls_back():
    # capacity not scene-divisible by the patch size -> silently uses the
    # legacy path (still correct)
    pb = make_batch([100, 80], capacity=384, num_classes=5)  # 192 % 128 != 0
    out_ref, _ = _run(pb, cfg(False))
    out_sb, _ = _run(pb, cfg(True))
    m = np.asarray(pb.mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.feat)[m], np.asarray(out_sb.feat)[m], rtol=1e-4, atol=2e-5
    )
