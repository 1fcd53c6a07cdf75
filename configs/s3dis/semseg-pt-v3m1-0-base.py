# PTv3 base on S3DIS (parity: reference configs/s3dis/semseg-pt-v3m1-0-base.py)
# Reuses the ScanNet PTv3 recipe; S3DIS areas are larger -> bigger crop/capacity.
_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]

point_capacity = 262144  # SphereCrop 204800 + slack
point_capacity_val = 262144

model = dict(num_classes=13)

epoch = 3000
eval_epoch = 100
optimizer = dict(lr=0.006)

dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    train=dict(
        type=dataset_type,
        split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        data_root=data_root,
    ),
    val=dict(type=dataset_type, split="Area_5", data_root=data_root),
    test=dict(type=dataset_type, split="Area_5", data_root=data_root),
)
