# sonata linear probing on aeo
# (parity: reference configs/sonata/semseg-sonata-v1m1-4a-aeo-lin.py)
_base_ = ["./semseg-sonata-v1m1-0a-scannet-lin.py"]

model = dict(num_classes=16)

data = dict(
    num_classes=16,
    names=[f"class_{i}" for i in range(16)],
    train=dict(type="AEODataset", data_root="data/aeo_semi"),
    val=dict(type="AEODataset", data_root="data/aeo_semi"),
    test=dict(type="AEODataset", data_root="data/aeo_semi"),
)
