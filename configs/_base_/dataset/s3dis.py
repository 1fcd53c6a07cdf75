# Reusable s3dis data block (parity: reference configs/_base_/dataset/s3dis.py)

dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(13)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
