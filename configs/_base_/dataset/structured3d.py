# Reusable structured3d data block (parity: reference configs/_base_/dataset/structured3d.py)

dataset_type = "Structured3DDataset"
data_root = "data/structured3d"

data = dict(
    num_classes=25,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(25)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
