# PTv2 m1 (grouped vector attention, pre-release variant) on S3DIS
# (parity: reference configs/s3dis/semseg-pt-v2m1-0-base.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(type="PT-v2m1"))

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.8], type='MultiStepLR')
param_dicts = None
