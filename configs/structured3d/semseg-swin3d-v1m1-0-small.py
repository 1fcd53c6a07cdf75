# Swin3D small on Structured3D
# (parity: reference configs/structured3d/semseg-swin3d-v1m1-0-small.py)
_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]

model = dict(num_classes=25, backbone=dict(in_channels=9))

dataset_type = "Structured3DDataset"
data_root = "data/structured3d"

data = dict(
    num_classes=25,
    names=[f"class_{i}" for i in range(25)],
    train=dict(type=dataset_type, data_root=data_root, split=("train", "test")),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.008, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.008, 0.0008], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='blocks', lr=0.0008)]
