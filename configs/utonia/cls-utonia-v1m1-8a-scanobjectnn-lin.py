# Utonia lin probe on ScanObjectNN
# (parity: reference configs/utonia/cls-utonia-v1m1-8a-scanobjectnn-lin.py)
_base_ = ["./cls-utonia-v1m1-7a-modelnet40-lin.py"]

model = dict(num_classes=15)

data = dict(
    num_classes=15,
    names=[
        "bag", "bin", "box", "cabinet", "chair", "desk", "display", "door",
        "shelf", "table", "bed", "pillow", "sink", "sofa", "toilet",
    ],
    train=dict(type="ScanObjectNNDataset", data_root="data/scanobjectnn"),
    val=dict(type="ScanObjectNNDataset", data_root="data/scanobjectnn"),
    test=dict(type="ScanObjectNNDataset", data_root="data/scanobjectnn"),
)
