# concerto-large decoder probing on s3dis: frozen encoder + light decoder
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-3b-s3dis-dec.py)
_base_ = ["./semseg-ptv3-large-v1m1-3a-s3dis-lin.py"]

model = dict(
    backbone_out_channels=64,
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 128, 256, 512),
        dec_num_head=(4, 8, 16, 32),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
