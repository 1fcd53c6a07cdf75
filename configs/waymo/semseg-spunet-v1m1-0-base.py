# SpUNet on Waymo (parity: reference configs/waymo/semseg-spunet-v1m1-0-base.py)
_base_ = ["../semantic_kitti/semseg-spunet-v1m1-0-base.py"]

model = dict(
    backbone=dict(in_channels=4, num_classes=22),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

dataset_type = "WaymoDataset"
data_root = "data/waymo"
names = [
    "Car", "Truck", "Bus", "Other Vehicle", "Motorcyclist", "Bicyclist",
    "Pedestrian", "Sign", "Traffic Light", "Pole", "Construction Cone",
    "Bicycle", "Motorcycle", "Building", "Vegetation", "Tree Trunk",
    "Curb", "Road", "Lane Marker", "Other Ground", "Walkable", "Sidewalk",
]

data = dict(
    num_classes=22,
    names=names,
    train=dict(type=dataset_type, data_root=data_root, split="training"),
    val=dict(type=dataset_type, data_root=data_root, split="validation"),
    test=dict(type=dataset_type, data_root=data_root, split="validation"),
)
