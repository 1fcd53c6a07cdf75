# CAC head over a PTv2 backbone with Lovasz loss on ScanNet
# (parity: reference configs/scannet/semseg-cac-v1m1-2-ptv2-lovasz.py)
_base_ = ["./semseg-cac-v1m1-1-spunet-lovasz.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="PT-v2m2",
        in_channels=6,
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
        grid_sizes=(0.06, 0.15, 0.375, 0.9375),
        attn_qkv_bias=True,
        pe_multiplier=False,
        pe_bias=True,
        attn_drop_rate=0.0,
        drop_path_rate=0.3,
        unpool_backend="map",
    ),
    backbone_out_channels=48,
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 900
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.005, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=0.005, pct_start=0.05, type='OneCycleLR')
param_dicts = None
