# PTv1 (PointTransformer-Seg50) on ScanNet
# (parity: reference configs/scannet/semseg-pt-v1-0-base.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="PointTransformer-Seg50",
        in_channels=9,
        num_classes=20,
    ),
)
