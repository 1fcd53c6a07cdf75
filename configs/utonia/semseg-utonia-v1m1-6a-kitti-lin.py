# utonia linear probing on kitti (outdoor, geometry-only features)
# (parity: reference configs/utonia/semseg-utonia-v1m1-6a-kitti-lin.py)
_base_ = ["../semantic_kitti/semseg-pt-v3m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=19,
    backbone_out_channels=1386,
    freeze_backbone=True,
    backbone=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,
    ),
    up_cast_level=0,
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

data = dict(
    train=dict(type="SemanticKITTIColorNormalDataset"),
    val=dict(type="SemanticKITTIColorNormalDataset"),
    test=dict(type="SemanticKITTIColorNormalDataset"),
)

epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.0)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.001,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = None

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=[0.002, 0.0002], pct_start=0.04, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
