# SpUNet on nuScenes (parity: reference configs/nuscenes/semseg-spunet-v1m1-0-base.py)
_base_ = ["../semantic_kitti/semseg-spunet-v1m1-0-base.py"]

model = dict(
    backbone=dict(in_channels=4, num_classes=16),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 50
eval_epoch = 50

dataset_type = "NuScenesDataset"
data_root = "data/nuscenes"
names = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]

data = dict(
    num_classes=16,
    names=names,
    train=dict(type=dataset_type, data_root=data_root, split="train"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
