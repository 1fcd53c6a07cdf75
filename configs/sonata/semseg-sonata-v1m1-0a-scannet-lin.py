# Sonata linear probing on ScanNet semseg
# (parity: reference configs/sonata/semseg-sonata-v1m1-0a-scannet-lin.py):
# frozen pretrained encoder, linear head over the up-cast concat features.
_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=1328,  # full up-cast concat width (sum of enc channels + final)
    freeze_backbone=True,
    backbone=dict(
        type="PT-v3m2",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        serialize_depth=11,
        grid_size=0.02,
    ),
    up_cast_level=0,  # concat the full skip chain (lin-probe features)
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
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
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
