# PPT-pretrained PointGroup on S3DIS at 0.05 m voxel size
# (parity: reference configs/s3dis/insseg-ppt-v1m1-0-pointgroup-spunet-ft-vs0p05.py)
_base_ = ["./insseg-ppt-v1m1-0-pointgroup-spunet-ft.py"]

grid_size = 0.05

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
