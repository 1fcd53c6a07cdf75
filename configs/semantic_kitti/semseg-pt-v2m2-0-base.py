# PTv2 on SemanticKITTI (parity: reference configs/semantic_kitti/semseg-pt-v2m2-0-base.py)
_base_ = ["../nuscenes/semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(num_classes=19))

dataset_type = "SemanticKITTIDataset"
data_root = "data/semantic_kitti"
names = [
    "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
    "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
]

data = dict(
    num_classes=19,
    names=names,
    train=dict(type=dataset_type, data_root=data_root, split="train"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
