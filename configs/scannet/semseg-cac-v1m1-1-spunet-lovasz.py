# CAC over SpUNet on ScanNet
# (parity: reference configs/scannet/semseg-cac-v1m1-1-spunet-lovasz.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="CAC-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        serialize_depth=11,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
    num_classes=20,
    backbone_out_channels=96,
    cos_temp=15,
    main_weight=1,
    pre_weight=1,
    pre_self_weight=1,
    kl_weight=1,
    conf_thresh=0,
    detach_pre_logits=True,
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
