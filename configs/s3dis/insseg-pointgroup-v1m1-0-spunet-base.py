# (parity: reference configs/s3dis/insseg-pointgroup-v1m1-0-spunet-base.py)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(semantic_num_classes=13)

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
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
