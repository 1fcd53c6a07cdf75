# sonata PointGroup insseg decoder probe on scannet200
# (parity: reference configs/sonata/insseg-sonata-v1m1-1b-scannet200-pg-dec.py)
_base_ = ["./insseg-sonata-v1m1-1a-scannet200-pg-lin.py"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
