# Swin3D small on S3DIS
# (parity: reference configs/s3dis/semseg-swin3d-v1m1-0-small.py)
_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]

model = dict(num_classes=13)

dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    train=dict(type=dataset_type, data_root=data_root, split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6")),
    val=dict(type=dataset_type, data_root=data_root, split="Area_5"),
    test=dict(type=dataset_type, data_root=data_root, split="Area_5"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.8], type='MultiStepLR')
param_dicts = [dict(keyword='blocks', lr=0.0001)]
