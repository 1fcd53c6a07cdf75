# utonia linear probing on s3dis
# (parity: reference configs/utonia/semseg-utonia-v1m1-3a-s3dis-lin.py)
_base_ = ["./semseg-utonia-v1m1-0a-scannet-lin.py"]

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
