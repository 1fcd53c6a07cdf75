# Tiny SpUNet on synthetic scenes — smoke-test config (CPU-runnable).
_base_ = ["./semseg-pt-v3m1-0-tiny.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    num_classes=13,
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=13,
        base_channels=8,
        channels=(8, 16, 32, 64, 64, 32, 24, 24),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        serialize_depth=10,
        pool_capacity_factor=0.6,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(_delete_=True, type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001, nesterov=True)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.05,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=10000.0,
)
param_dicts = None
epoch = 1
eval_epoch = 1
