# SpUNet classifier on ModelNet40
# (parity: reference configs/modelnet40/cls-spunet-v1m1-0-base.py)
_base_ = ["./cls-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        serialize_depth=8,
        grid_size=0.05,
    ),
    backbone_embed_dim=96,
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 200
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, gamma=0.1, milestones=[0.6, 0.8], type='MultiStepLR')
param_dicts = None
