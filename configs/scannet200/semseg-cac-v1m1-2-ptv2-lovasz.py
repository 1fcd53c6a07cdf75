# CAC over PTv2 with Lovasz on ScanNet200
# (parity: reference configs/scannet200/semseg-cac-v1m1-2-ptv2-lovasz.py)
_base_ = ["../scannet/semseg-cac-v1m1-2-ptv2-lovasz.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
