# Large LitePT on Structured3D
# (parity: reference configs/structured3d/semseg-litept-v1m1-0-large.py)
_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(48, 96, 192, 384, 512),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 96, 192, 384),
    ),
)
