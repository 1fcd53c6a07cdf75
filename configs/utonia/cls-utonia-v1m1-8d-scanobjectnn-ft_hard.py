# Utonia ft_hard probe on ScanObjectNN (hardest)
# (parity: reference configs/utonia/cls-utonia-v1m1-8d-scanobjectnn-ft_hard.py)
_base_ = ["./cls-utonia-v1m1-7b-modelnet40-ft.py"]

model = dict(num_classes=15)

data = dict(
    num_classes=15,
    names=[
        "bag", "bin", "box", "cabinet", "chair", "desk", "display", "door",
        "shelf", "table", "bed", "pillow", "sink", "sofa", "toilet",
    ],
    train=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
    val=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
    test=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
)
