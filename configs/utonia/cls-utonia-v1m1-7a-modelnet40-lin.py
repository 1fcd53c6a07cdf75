# Utonia linear probing on ModelNet40 classification
# (parity: reference configs/utonia/cls-utonia-v1m1-7a-modelnet40-lin.py)
_base_ = ["../modelnet40/cls-pt-v3m1-0-base.py"]

model = dict(
    backbone_embed_dim=1386,
    freeze_backbone=True,
    backbone=dict(
        _delete_=True,
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=8,
        grid_size=0.05,
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 300
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.01)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.001, 0.0001], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0001)]
