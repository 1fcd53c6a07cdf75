# Stratified Transformer refined on ScanNet200
# (parity: reference configs/scannet200/semseg-st-v1m2-0-refined.py)
_base_ = ["../scannet/semseg-st-v1m2-0-refined.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
