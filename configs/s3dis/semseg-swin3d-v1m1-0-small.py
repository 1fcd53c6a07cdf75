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
