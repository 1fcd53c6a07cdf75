# Reusable scannet data block (parity: reference configs/_base_/dataset/scannet.py)

dataset_type = "ScanNetDataset"
data_root = "data/scannet"

data = dict(
    num_classes=20,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(20)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
