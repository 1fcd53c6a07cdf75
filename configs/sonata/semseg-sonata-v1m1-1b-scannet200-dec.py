# sonata decoder probing on scannet200: frozen encoder + light decoder
# (parity: reference configs/sonata/semseg-sonata-v1m1-1b-scannet200-dec.py)
_base_ = ["./semseg-sonata-v1m1-1a-scannet200-lin.py"]

model = dict(
    backbone_out_channels=64,
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
