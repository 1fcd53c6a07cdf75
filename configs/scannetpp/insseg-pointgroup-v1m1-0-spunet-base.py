# PointGroup SpUNet instance segmentation on ScanNet++
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m1-0-spunet-base.py)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(semantic_num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
