# SpUNet on S3DIS with color+normal input features
# (parity: reference configs/s3dis/semseg-spunet-v1m1-0-cn-base.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(in_channels=9))

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
