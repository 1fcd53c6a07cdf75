# concerto-large PointGroup insseg linear probe on scannet
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-0a-scannet-pg-lin.py)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    type="PG-v1m2",
    semantic_num_classes=20,
    backbone_out_channels=64,
    freeze_backbone=True,
    backbone=dict(
        _delete_=True,
        type="PT-v3m2",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=False,
        serialize_depth=11,
        grid_size=0.02,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 128, 256, 512),
        dec_num_head=(4, 8, 16, 32),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
)

epoch = 800
optimizer = dict(_delete_=True, type="AdamW", lr=0.002, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.002,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
