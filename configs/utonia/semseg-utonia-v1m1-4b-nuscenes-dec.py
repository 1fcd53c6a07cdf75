# utonia decoder probing on nuscenes: frozen encoder + light decoder
# (parity: reference configs/utonia/semseg-utonia-v1m1-4b-nuscenes-dec.py)
_base_ = ["./semseg-utonia-v1m1-4a-nuscenes-lin.py"]

model = dict(
    backbone_out_channels=54,
    backbone=dict(
        enc_mode=False,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(54, 108, 216, 432),
        dec_num_head=(3, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.001, 2e-05], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=2e-05)]
