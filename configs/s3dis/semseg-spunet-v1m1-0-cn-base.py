# SpUNet on S3DIS with color+normal input features
# (parity: reference configs/s3dis/semseg-spunet-v1m1-0-cn-base.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(in_channels=9))
