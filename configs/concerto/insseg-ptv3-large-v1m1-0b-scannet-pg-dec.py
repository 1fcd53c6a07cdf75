# concerto-large PointGroup insseg decoder probe on scannet
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-0b-scannet-pg-dec.py)
_base_ = ["./insseg-ptv3-large-v1m1-0a-scannet-pg-lin.py"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
