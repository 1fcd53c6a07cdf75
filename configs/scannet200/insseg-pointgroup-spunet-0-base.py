# PointGroup instance segmentation on ScanNet200
# (parity: reference configs/scannet200/insseg-pointgroup-spunet-0-base.py)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(semantic_num_classes=200)

dataset_type = "ScanNet200Dataset"

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)
