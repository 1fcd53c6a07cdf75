# (parity: reference configs/scannet200/semseg-pt-v2m2-0-base.py)
_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(num_classes=200))

dataset_type = "ScanNet200Dataset"

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)
