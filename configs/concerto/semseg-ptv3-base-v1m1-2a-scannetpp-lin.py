# Concerto PTv3-base lin probe on scannetpp
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-2a-scannetpp-lin.py)
_base_ = ["./semseg-ptv3-base-v1m1-0a-scannet-lin.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
