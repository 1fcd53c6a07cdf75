# Overfit harness: tiny PTv3 memorizing 8 fixed synthetic scenes (CPU-runnable).
#
# Used by tests/test_overfit.py to prove the training loop LEARNS (loss -> ~0,
# train accuracy -> ~1) — the cheapest guard against VJP bugs in the
# hand-written kernels (block fill, permute gathers, masked BN, flash
# attention). The test split serves the SAME scenes through the fragment/TTA
# test pipeline so SemSegTester.test() can be asserted against memorized labels
# (reference integration-test obligation, SURVEY.md §4).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 8
num_worker = 0
mix_prob = 0.0
empty_cache = False
enable_amp = True
seed = 0

point_capacity = 4096
point_capacity_val = 4096
point_capacity_test = 4096

num_classes = 6

model = dict(
    type="DefaultSegmentorV2",
    num_classes=num_classes,
    backbone_out_channels=16,
    backbone=dict(
        type="PT-v3m1",
        in_channels=9,
        order=("z", "z-trans"),
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
        shuffle_orders=False,
        serialize_depth=10,
        pool_capacity_factors=(0.5, 0.5),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

# loop-compression: one "training epoch" = `epoch` dataset passes (8 scenes /
# batch 8 = 1 step each) -> `epoch` optimizer steps, one eval at the end
epoch = 150
eval_epoch = 1
optimizer = dict(type="AdamW", lr=0.005, weight_decay=0.0)
scheduler = dict(
    type="OneCycleLR",
    max_lr=0.005,
    pct_start=0.1,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=100.0,
)

dataset_type = "SyntheticSemSegDataset"
_scene_kwargs = dict(num_scenes=8, num_points=2400, num_classes=num_classes, seed_offset=0)

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(num_classes)],
    train=dict(
        type=dataset_type,
        split="train",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "color", "normal")),
        ],
        test_mode=False,
        **_scene_kwargs,
    ),
    # val = the SAME fixed scenes: the metric is memorization, not generalization
    val=dict(
        type=dataset_type,
        split="train",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "color", "normal")),
        ],
        test_mode=False,
        **_scene_kwargs,
    ),
    # full fragment/TTA test pipeline over the SAME scenes (SemSegTester e2e);
    # the main-transform GridSample(return_inverse) exercises the tester's
    # origin_segment/inverse full-resolution mapping (reference scannetpp
    # pipeline shape, engines/test.py:219-222)
    test=dict(
        type=dataset_type,
        split="train",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="NormalizeColor"),
            dict(type="Copy", keys_dict={"segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.033, hash_type="fnv", mode="train", return_inverse=True),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="test", return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "index"), feat_keys=("coord", "color", "normal")),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z", center=[0, 0, 0], p=1)],
            ],
        ),
        **_scene_kwargs,
    ),
)
