# concerto-large PointGroup insseg linear probe on scannetpp
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-2a-scannetpp-pg-lin.py)
_base_ = ["./insseg-ptv3-large-v1m1-0a-scannet-pg-lin.py"]

model = dict(semantic_num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
