# Utonia full fine-tune on ModelNet40 classification
# (parity: reference configs/utonia/cls-utonia-v1m1-7b-modelnet40-ft.py)
_base_ = ["./cls-utonia-v1m1-7a-modelnet40-lin.py"]

model = dict(freeze_backbone=False)

optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
