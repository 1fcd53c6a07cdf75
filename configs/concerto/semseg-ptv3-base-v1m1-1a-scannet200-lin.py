# Concerto PTv3-base lin probe on scannet200
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-1a-scannet200-lin.py)
_base_ = ["./semseg-ptv3-base-v1m1-0a-scannet-lin.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
