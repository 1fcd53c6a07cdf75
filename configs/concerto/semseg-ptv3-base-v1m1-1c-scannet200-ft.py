# Concerto PTv3-base ft probe on scannet200
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-1c-scannet200-ft.py)
_base_ = ["./semseg-ptv3-base-v1m1-1a-scannet200-lin.py"]

model = dict(
    freeze_backbone=False,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
eval_epoch = 100
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
