# OctFormer on ScanNet++
# (parity: reference configs/scannetpp/semseg-octformer-v1m1-0-base.py)
_base_ = ["../scannet/semseg-octformer-v1m1-0-base.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.0015, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.9], type='MultiStepWithWarmupLR', warmup_rate=0.05, warmup_scale=1e-05)
param_dicts = [dict(keyword='blocks', lr=0.00015)]
