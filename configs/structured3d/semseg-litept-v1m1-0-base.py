# Base LitePT on Structured3D
# (parity: reference configs/structured3d/semseg-litept-v1m1-0-base.py)
_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        enc_depths=(2, 2, 2, 2, 2),
        dec_depths=(2, 2, 2, 2),
    ),
)
