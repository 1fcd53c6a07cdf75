# Stratified Transformer refined on ScanNet200
# (parity: reference configs/scannet200/semseg-st-v1m2-0-refined.py)
_base_ = ["../scannet/semseg-st-v1m2-0-refined.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.8], type='MultiStepLR')
param_dicts = None
