# PTv3 base on Matterport3D
# (parity: reference configs/matterport3d/semseg-pt-v3m1-0-base.py)
_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]

model = dict(num_classes=21)

epoch = 100
eval_epoch = 100

dataset_type = "MatterportDataset"
data_root = "data/matterport3d"
_names = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub", "other",
    "ceiling",
)

data = dict(
    num_classes=21,
    names=list(_names),
    train=dict(type=dataset_type, data_root=data_root, split="train"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
