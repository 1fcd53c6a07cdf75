# Stratified Transformer (original v1m1 recipe) on ScanNet
# (parity: reference configs/scannet/semseg-st-v1m1-0-origin.py)
_base_ = ["./semseg-st-v1m2-0-refined.py"]

model = dict(
    backbone=dict(type="ST-v1m1"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.8], type='MultiStepLR')
param_dicts = None
