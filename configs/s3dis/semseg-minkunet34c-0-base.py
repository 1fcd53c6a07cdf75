# (parity: reference configs/s3dis/semseg-minkunet34c-0-base.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(type="MinkUNet34C"))
