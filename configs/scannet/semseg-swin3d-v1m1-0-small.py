# Swin3D (small) on ScanNet semseg
# (parity: reference configs/scannet/semseg-swin3d-v1m1-0-small.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

batch_size = 12
mix_prob = 0

point_capacity = 131072
point_capacity_val = 131072

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="Swin3D-v1m1",
        in_channels=9,
        num_classes=20,
        base_grid_size=0.02,
        depths=(2, 4, 9, 4, 4),
        channels=(48, 96, 192, 384, 384),
        num_heads=(6, 6, 12, 24, 24),
        window_sizes=(5, 7, 7, 7, 7),
        quant_size=4,
        drop_path_rate=0.3,
        up_k=3,
        stem_transformer=True,
        upsample="linear",
        cRSE="XYZ_RGB_NORM",
        coord_feat_dim=6,  # color+normal lead the feat vector
        serialize_depth=11,
        patch_size=128,  # TPU knob: exact for windows <= 64 voxels
        level_capacity_factor=0.45,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 600
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="MultiStepWithWarmupLR",
    milestones=[0.6, 0.8],
    gamma=0.1,
    warmup_rate=0.05,
    warmup_scale=1e-5,
)
param_dicts = [dict(keyword="blocks", lr=0.0001)]

_feat = ("color", "normal", "displacement")
data = dict(
    train=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(
                type="GridSample",
                grid_size=0.02,
                hash_type="fnv",
                mode="train",
                return_grid_coord=True,
                return_displacement=True,
                project_displacement=True,
            ),
            dict(type="SphereCrop", point_max=120000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=_feat),
        ],
    ),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(
                type="GridSample",
                grid_size=0.02,
                hash_type="fnv",
                mode="train",
                return_grid_coord=True,
                return_displacement=True,
                project_displacement=True,
            ),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=_feat),
        ],
    ),
    test=dict(
        test_cfg=dict(
            voxelize=dict(
                type="GridSample",
                grid_size=0.02,
                hash_type="fnv",
                mode="test",
                return_grid_coord=True,
                return_displacement=True,
                project_displacement=True,
            ),
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="NormalizeColor"),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "index"), feat_keys=_feat),
            ],
        ),
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='blocks', lr=0.0006)]
