# (parity: reference configs/scannetpp/semseg-pt-v2m2-0-base.py)
_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(num_classes=100))

dataset_type = "ScanNetPPDataset"
data_root = "data/scannetpp"

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type=dataset_type, data_root=data_root, split="train_grid1mm_chunk6x6_stride3x3"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
