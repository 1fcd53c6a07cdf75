# Reusable shapenet_part data block (parity: reference configs/_base_/dataset/shapenet_part.py)

dataset_type = "ShapeNetPartDataset"
data_root = "data/shapenetcore_partanno_segmentation_benchmark_v0_normal"

data = dict(
    num_classes=50,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(50)],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
