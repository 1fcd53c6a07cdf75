# Base LitePT on Structured3D
# (parity: reference configs/structured3d/semseg-litept-v1m1-0-base.py)
_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        enc_depths=(2, 2, 2, 2, 2),
        dec_depths=(2, 2, 2, 2),
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 200
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0006)]
