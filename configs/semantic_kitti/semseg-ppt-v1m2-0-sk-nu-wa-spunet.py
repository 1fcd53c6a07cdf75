# PPT v1m2 (decoupled per-dataset heads, no language guidance) validated on SemanticKITTI
# (parity: reference configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet.py)
_base_ = ["./semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]

model = dict(
    _delete_=True,
    type="PPT-v1m2",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4,
        num_classes=0,
        base_channels=32,
        context_channels=256,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        conditions=("SemanticKITTI", "nuScenes", "Waymo"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
        serialize_depth=11,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    num_classes=(19, 16, 22),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=0.002, pct_start=0.04, type='OneCycleLR')
param_dicts = None
