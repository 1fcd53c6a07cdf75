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
