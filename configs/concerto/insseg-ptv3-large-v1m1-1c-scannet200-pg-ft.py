# concerto-large PointGroup insseg full fine-tune on scannet200
# (parity: reference configs/concerto/insseg-ptv3-large-v1m1-1c-scannet200-pg-ft.py)
_base_ = ["./insseg-ptv3-large-v1m1-1a-scannet200-pg-lin.py"]

model = dict(freeze_backbone=False)
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
