# Sonata linear probing on S3DIS Area-5
# (parity: reference configs/sonata/semseg-sonata-v1m1-3a-s3dis-lin.py)
_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]

point_capacity = 262144
point_capacity_val = 262144

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
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
