# concerto-large PointGroup insseg linear probe on scannet200
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-1a-scannet200-pg-lin.py)
_base_ = ["./insseg-ptv3-large-v1m1-0a-scannet-pg-lin.py"]

model = dict(semantic_num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
