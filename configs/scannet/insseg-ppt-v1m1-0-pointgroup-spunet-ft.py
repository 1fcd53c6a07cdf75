# PPT-pretrained SpUNet fine-tuned for PointGroup instance segmentation on ScanNet
# (parity: reference configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py)
_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    backbone=dict(
        type="SpUNet-v1m3",
        conditions=("ScanNet", "S3DIS", "Structured3D"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
