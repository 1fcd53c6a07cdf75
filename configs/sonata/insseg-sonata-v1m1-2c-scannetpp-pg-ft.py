# sonata PointGroup insseg full fine-tune on scannetpp
# (parity: reference configs/sonata/insseg-sonata-v1m1-2c-scannetpp-pg-ft.py)
_base_ = ["./insseg-sonata-v1m1-2a-scannetpp-pg-lin.py"]

model = dict(freeze_backbone=False)
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
