# sonata PointGroup insseg decoder probe on s3dis
# (parity: reference configs/sonata/insseg-sonata-v1m1-3b-s3dis-pg-dec.py)
_base_ = ["./insseg-sonata-v1m1-3a-s3dis-pg-lin.py"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
