# OctFormer on ScanNet++
# (parity: reference configs/scannetpp/semseg-octformer-v1m1-0-base.py)
_base_ = ["../scannet/semseg-octformer-v1m1-0-base.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
