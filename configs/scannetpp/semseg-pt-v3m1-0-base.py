# PTv3 base on ScanNet++ (parity: reference configs/scannetpp/semseg-pt-v3m1-0-base.py)
_base_ = ["../scannet/semseg-pt-v3m1-0-base.py"]

model = dict(num_classes=100)

dataset_type = "ScanNetPPDataset"
data_root = "data/scannetpp"

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],  # top-100 benchmark list lives with the data
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
