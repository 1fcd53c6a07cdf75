# PTv3 base on Waymo semseg (parity: reference configs/waymo/semseg-pt-v3m1-0-base.py)
_base_ = ["../nuscenes/semseg-pt-v3m1-0-base.py"]

point_capacity = 262144  # two-return Waymo frames are ~170k points @ 0.05 m
point_capacity_val = 262144

model = dict(num_classes=22)

dataset_type = "WaymoDataset"
data_root = "data/waymo"

names = [
    "Car", "Truck", "Bus", "Other Vehicle", "Motorcyclist", "Bicyclist",
    "Pedestrian", "Sign", "Traffic Light", "Pole", "Construction Cone",
    "Bicycle", "Motorcycle", "Building", "Vegetation", "Tree Trunk", "Curb",
    "Road", "Lane Marker", "Other Ground", "Walkable", "Sidewalk",
]

data = dict(
    num_classes=22,
    names=names,
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
