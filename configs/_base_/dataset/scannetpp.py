# Reusable scannetpp data block (parity: reference configs/_base_/dataset/scannetpp.py)

dataset_type = "ScanNetPPDataset"
data_root = "data/scannetpp"

data = dict(
    num_classes=100,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
