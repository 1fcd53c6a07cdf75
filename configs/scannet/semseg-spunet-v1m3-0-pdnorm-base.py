# SpUNet-v1m3 (PDNorm) single-dataset sanity config: the ScanNet condition is
# tagged on every sample so the prompt-driven norms select the ScanNet branch
# (parity: reference configs/scannet/semseg-spunet-v1m3-0-pdnorm-base.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=20,
        base_channels=32,
        context_channels=256,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        conditions=("ScanNet", "S3DIS", "Structured3D"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=False,
        norm_affine=True,
        serialize_depth=11,
    ),
)
