# SpUNet classifier on ModelNet40
# (parity: reference configs/modelnet40/cls-spunet-v1m1-0-base.py)
_base_ = ["./cls-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        serialize_depth=8,
        grid_size=0.05,
    ),
    backbone_embed_dim=96,
)
