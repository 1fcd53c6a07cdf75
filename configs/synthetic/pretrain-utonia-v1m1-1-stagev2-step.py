# Utonia stage-v2 step harness (CPU-runnable): PartialSampledTrainer over a
# ConcatDataset (indoor scans + a larger object corpus capped per epoch by
# DistributedImbalancedSampler), tiny Utonia with a FROZEN offline teacher.
#
# Used by tests/test_utonia.py::test_utonia_stagev2_partial_sampled_step to
# execute the staged-pretrain mechanics for real (reference
# utonia_v1m1_base.py:198-209 + engines/train.py:359): sampler cap honored,
# teacher params bit-identical across optimizer steps.
_base_ = ["../_base_/default_runtime.py"]

batch_size = 8  # 8 virtual devices in the test harness (1 scene/device)
num_worker = 0
mix_prob = 0.0
empty_cache = False
enable_amp = True
seed = 0

point_capacity = 4096

epoch = 1
eval_epoch = 1
evaluate = False

model = dict(
    type="Utonia-v1m1",
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 32),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(32, 32, 32),
        mlp_ratio=2,
        drop_path=0.0,
        enc_mode=True,
        shuffle_orders=False,
        serialize_depth=8,
        pool_capacity_factors=(0.75, 0.75),
    ),
    head_in_channels=56,
    head_hidden_channels=32,
    head_embed_channels=16,
    head_num_prototypes=8,
    num_global_view=2,
    num_local_view=4,
    up_cast_level=2,
    mask_size_start=5.0,
    mask_size_base=20.0,
    mask_size_scale=0.05,
    teacher_custom=dict(drop_path=0.0),
    sonata_model_type="offline",  # stage-2: frozen offline teacher
)

train = dict(type="PartialSampledTrainer")
sampled_dataset_id = 1  # the object corpus below
sampled_dataset_limit = 8

optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.01)
scheduler = dict(
    type="OneCycleLR",
    max_lr=0.001,
    pct_start=0.1,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=100.0,
)

_mv_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
    dict(type="Copy", keys_dict={"coord": "origin_coord"}),
    dict(type="NormalizeColor"),
    dict(
        type="MultiViewGenerator",
        global_view_num=2,
        global_view_scale=(0.6, 1.0),
        local_view_num=4,
        local_view_scale=(0.2, 0.4),
        global_transform=[dict(type="RandomScale", scale=[0.9, 1.1])],
        local_transform=[dict(type="RandomScale", scale=[0.9, 1.1])],
        view_keys=("coord", "origin_coord", "color", "normal"),
    ),
    dict(
        type="Collect",
        keys=("global_coord", "global_origin_coord", "local_coord", "local_origin_coord"),
        offset_keys_dict=dict(global_offset="global_coord", local_offset="local_coord"),
        global_feat_keys=("global_color", "global_normal"),
        local_feat_keys=("local_color", "local_normal"),
    ),
]

data = dict(
    num_classes=5,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(5)],
    train=dict(
        type="ConcatDataset",
        datasets=[
            # "indoor scans" domain
            dict(
                type="SyntheticSemSegDataset",
                split="train",
                num_scenes=8,
                num_points=500,
                num_classes=5,
                seed_offset=0,
                transform=_mv_transform,
                test_mode=False,
            ),
            # "object" domain: larger corpus, capped at sampled_dataset_limit
            dict(
                type="SyntheticSemSegDataset",
                split="train",
                num_scenes=12,
                num_points=400,
                num_classes=5,
                seed_offset=100,
                transform=_mv_transform,
                test_mode=False,
            ),
        ],
    ),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="SonataHook"),
    dict(type="CheckpointSaver", save_freq=None),
]
