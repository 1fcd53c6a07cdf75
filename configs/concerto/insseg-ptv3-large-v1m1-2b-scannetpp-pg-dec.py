# concerto-large PointGroup insseg decoder probe on scannetpp
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-2b-scannetpp-pg-dec.py)
_base_ = ["./insseg-ptv3-large-v1m1-2a-scannetpp-pg-lin.py"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
