# concerto-large PointGroup insseg decoder probe on s3dis
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-3b-s3dis-pg-dec.py)
_base_ = ["./insseg-ptv3-large-v1m1-3a-s3dis-pg-lin.py"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
