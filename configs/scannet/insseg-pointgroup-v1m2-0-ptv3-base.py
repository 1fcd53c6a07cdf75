# PointGroup-v1m2 (PTv3 backbone) instance segmentation on ScanNet
# (parity: reference configs/scannet/insseg-pointgroup-v1m2-0-ptv3-base.py)
_base_ = ["../scannetpp/insseg-pointgroup-v1m2-0-ptv3-base.py"]

model = dict(semantic_num_classes=20)

data = dict(
    num_classes=20,
    train=dict(type="ScanNetDataset", data_root="data/scannet"),
    val=dict(type="ScanNetDataset", data_root="data/scannet"),
)
