"""Device-resident fragment accumulation == the host np.add.at loop.

The fast path (`SemSegTester._test_scene_device`) ships each fragment as one
packed int32 wire buffer, runs the eval forward, and scatter-adds the softmax
into a [2*cap, C] device accumulator (trash region for pad rows); only the
final per-scene buffer crosses the wire. Reference semantics
(`/root/reference/pointcept/engines/test.py:122-353`) are the host loop; the
two must agree to float tolerance on predictions and exactly on argmax labels.
"""

import os

import numpy as np
import pytest

from pointcept_tpu.engines.test import TESTERS
from pointcept_tpu.utils.config import Config


def _cfg(tmp_path, device_accumulate, sub):
    model = dict(
        type="DefaultSegmentorV2",
        num_classes=13,
        backbone_out_channels=32,
        backbone=dict(
            type="PT-v3m1",
            in_channels=6,
            order=("z", "z-trans", "hilbert", "hilbert-trans"),
            stride=(2, 2),
            enc_depths=(1, 1, 1),
            enc_channels=(16, 32, 64),
            enc_num_head=(2, 4, 8),
            enc_patch_size=(128, 128, 128),
            dec_depths=(1, 1),
            dec_channels=(16, 32),
            dec_num_head=(2, 4),
            dec_patch_size=(128, 128),
            mlp_ratio=2,
            drop_path=0.0,
            serialize_depth=10,
            pool_capacity_factors=(0.7, 0.7),
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    )
    return Config(
        dict(
            save_path=str(tmp_path / sub),
            batch_size_test_per_gpu=1,
            point_capacity_test=8192,
            num_worker=0,
            seed=0,
            device_accumulate=device_accumulate,
            model=model,
            data=dict(
                num_classes=13,
                ignore_index=-1,
                names=[f"c{i}" for i in range(13)],
                test=dict(
                    type="SyntheticSemSegDataset",
                    split="val",
                    num_scenes=2,
                    num_points=6000,
                    num_classes=13,
                    transform=[
                        dict(type="CenterShift", apply_z=True),
                        dict(type="NormalizeColor"),
                    ],
                    test_mode=True,
                    test_cfg=dict(
                        voxelize=dict(
                            type="GridSample", grid_size=0.05, hash_type="fnv",
                            mode="test", return_grid_coord=True,
                        ),
                        crop=None,
                        post_transform=[
                            dict(type="CenterShift", apply_z=False),
                            dict(type="ToTensor"),
                            dict(
                                type="Collect", keys=("coord", "grid_coord", "index"),
                                feat_keys=("color", "normal"),
                            ),
                        ],
                        aug_transform=[
                            [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                                  center=[0, 0, 0], p=1)],
                        ],
                    ),
                ),
            ),
        )
    )


def _run(tmp_path, device_accumulate, sub, state=None):
    os.makedirs(str(tmp_path / sub), exist_ok=True)
    tester = TESTERS.build(
        dict(type="SemSegTester", cfg=_cfg(tmp_path, device_accumulate, sub))
    )
    if state is not None:
        tester.state = state  # identical (random-init) weights across runs
    res = tester.test()
    preds = {}
    rd = os.path.join(str(tmp_path / sub), "result")
    for f in sorted(os.listdir(rd)):
        if f.endswith("_pred.npy"):
            preds[f] = np.load(os.path.join(rd, f))
    return res, preds, tester.state


def test_device_accumulate_matches_host_loop(tmp_path):
    res_f, preds_f, state = _run(tmp_path, True, "fast")
    res_h, preds_h, _ = _run(tmp_path, False, "host", state=state)
    assert preds_f.keys() == preds_h.keys() and preds_f
    for k in preds_f:
        assert preds_f[k].shape == preds_h[k].shape
        np.testing.assert_allclose(preds_f[k], preds_h[k], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.argmax(preds_f[k], -1), np.argmax(preds_h[k], -1)
        )
    assert res_f is not None and res_h is not None
    assert abs(res_f["mIoU"] - res_h["mIoU"]) < 1e-6


def _grouped_cfg(tmp_path, sub, reuse):
    cfg = _cfg(tmp_path, True, sub)
    # host_geometry off -> no host plan -> the shared-geometry grouped
    # fragment path engages (gather conv engine: the block engine's dense
    # tiles are pathological on sparse low-density synthetic scenes and on
    # the 1-core CPU CI box; the block-engine grouped path is exercised on
    # the TPU bench instead). fragment_geometry_reuse=False pins the old
    # per-fragment loop on the same model for comparison.
    cfg._cfg_dict["host_geometry"] = False
    cfg._cfg_dict["fragment_geometry_reuse"] = reuse
    # keep the grouped scene graph (scan of batched forwards) SMALL: it is
    # the largest graph the quick tier compiles on the 1-core box
    bb = cfg.model["backbone"]
    bb["order"] = ("z", "z-trans")
    bb["enc_depths"] = (1, 1)
    bb["enc_channels"] = (16, 32)
    bb["enc_num_head"] = (2, 4)
    bb["enc_patch_size"] = (64, 64)
    bb["stride"] = (2,)
    bb["dec_depths"] = (1,)
    bb["dec_channels"] = (16,)
    bb["dec_num_head"] = (2,)
    bb["dec_patch_size"] = (64,)
    bb["pool_capacity_factors"] = (0.7,)
    cfg._cfg_dict["point_capacity_test"] = 4096
    cfg.data["test"]["num_points"] = 2500
    return cfg


def test_fragment_geometry_reuse_matches_per_fragment(tmp_path):
    """Grouped path (shared build_geometry + B=4-batched scan) must reproduce
    the per-fragment loop's accumulated predictions."""
    os.makedirs(str(tmp_path / "grp"), exist_ok=True)
    t1 = TESTERS.build(dict(type="SemSegTester", cfg=_grouped_cfg(tmp_path, "grp", True)))
    assert t1._fragment_geometry_ok()
    res1 = t1.test()
    os.makedirs(str(tmp_path / "frag"), exist_ok=True)
    t2 = TESTERS.build(dict(type="SemSegTester", cfg=_grouped_cfg(tmp_path, "frag", False)))
    assert not t2._fragment_geometry_ok()
    t2.state = t1.state
    res2 = t2.test()
    rd1 = os.path.join(str(tmp_path / "grp"), "result")
    rd2 = os.path.join(str(tmp_path / "frag"), "result")
    names = sorted(f for f in os.listdir(rd1) if f.endswith("_pred.npy"))
    assert names
    for f in names:
        a = np.load(os.path.join(rd1, f))
        b = np.load(os.path.join(rd2, f))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.argmax(a, -1), np.argmax(b, -1))
    assert abs(res1["mIoU"] - res2["mIoU"]) < 1e-6
