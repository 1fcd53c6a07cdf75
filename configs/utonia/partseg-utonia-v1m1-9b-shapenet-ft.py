# Utonia part-seg full fine-tune on shapenet
# (parity: reference configs/utonia/partseg-utonia-v1m1-9b-shapenet-ft.py)
_base_ = ["./partseg-utonia-v1m1-9a-shapenet-lin.py"]

model = dict(freeze_backbone=False)
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
