# PTv2 on nuScenes (parity: reference configs/nuscenes/semseg-pt-v2m2-0-base.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v2m2",
        in_channels=4,
        num_classes=16,
        patch_embed_depth=1,
        patch_embed_channels=48,
        patch_embed_groups=6,
        patch_embed_neighbours=8,
        enc_depths=(2, 2, 6, 2),
        enc_channels=(96, 192, 384, 512),
        enc_groups=(12, 24, 48, 64),
        enc_neighbours=(16, 16, 16, 16),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(48, 96, 192, 384),
        dec_groups=(6, 12, 24, 48),
        dec_neighbours=(16, 16, 16, 16),
        grid_sizes=(0.15, 0.375, 0.9375, 2.34375),
        attn_qkv_bias=True,
        pe_multiplier=False,
        pe_bias=True,
        attn_drop_rate=0.0,
        drop_path_rate=0.3,
        unpool_backend="map",
        pool_capacity_factors=(0.5, 0.35, 0.3, 0.3),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=0.002, pct_start=0.04, type='OneCycleLR')
param_dicts = None
