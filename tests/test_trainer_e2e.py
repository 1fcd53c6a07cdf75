"""End-to-end Trainer smoke test on the tiny synthetic PTv3 config.

Exercises the full stack: config parsing with _base_ inheritance, synthetic
dataset + transform pipeline, device_collate with host geometry (the default
for PT-v3 backbones), the jitted shard_map train step over the 8-device CPU
mesh, the per-epoch SemSegEvaluator, and checkpointing.
"""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_trainer_synthetic_ptv3(tmp_path):
    from pointcept_tpu.engines.defaults import default_config_parser, default_setup
    from pointcept_tpu.engines.train import TRAINERS

    cfg = default_config_parser(
        "configs/synthetic/semseg-pt-v3m1-0-tiny.py",
        dict(
            save_path=str(tmp_path),
            epoch=1,
            eval_epoch=1,
            batch_size=8,
            num_worker=0,
            point_capacity=4096,
            point_capacity_val=4096,
        ),
    )
    cfg = default_setup(cfg)
    trainer = TRAINERS.build(dict(type=cfg.train.type, cfg=cfg))
    # host geometry must be active for the PT-v3 backbone by default
    assert trainer.geometry_plan(cfg.point_capacity, train=True) is not None
    trainer.train()
    loss = trainer.comm_info["metrics"]["loss"]
    assert np.isfinite(float(loss))
    assert os.path.exists(os.path.join(cfg.save_path, "model", "model_last"))


@pytest.mark.slow
def test_trainer_geometry_collate_matches_plan():
    """device_collate with a geometry plan attaches geo_* arrays shaped to it."""
    from pointcept_tpu.datasets import build_dataset
    from pointcept_tpu.datasets.transform import Compose
    from pointcept_tpu.engines.train import device_collate
    from pointcept_tpu.ops import host_geometry as hg

    ds = build_dataset(
        dict(
            type="SyntheticSemSegDataset",
            split="train",
            num_scenes=4,
            num_points=1500,
            num_classes=5,
            transform=[
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
                dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
            ],
        )
    )
    bb = dict(
        type="PT-v3m1", enc_depths=(1, 1, 1), enc_patch_size=(64, 64, 64),
        pool_capacity_factors=(0.5, 0.5), stride=(2, 2), serialize_depth=10,
    )
    plan = hg.ptv3_plan(bb, capacity=2048, num_scenes=1)
    samples = [ds[i] for i in range(4)]
    out = device_collate(samples, num_devices=2, capacity_per_device=2048, geometry_plan=plan)
    assert out["geo_nbr_stem"].shape == (2, 2048, 125)
    assert out["geo_nbr3_2"].shape == (2, 512, 27)
    assert out["geo_pool_1_cluster"].shape == (2, 2048)
    caps = hg.ptv3_stage_caps(2048, (0.5, 0.5))
    p0 = hg.patch_capacity(caps[0], 64, 2)
    assert out["geo_part_0_0_slot"].shape == (2, p0)
