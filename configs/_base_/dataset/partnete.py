# Reusable partnete data block (parity: reference configs/_base_/dataset/partnete.py)

dataset_type = "PartNetEDataset"
data_root = "data/partnete"

data = dict(
    num_classes=148,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(148)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
