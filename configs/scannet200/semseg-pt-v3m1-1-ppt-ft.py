# PPT-pretrained PTv3 fine-tuned on ScanNet200
# (parity: reference configs/scannet200/semseg-pt-v3m1-1-ppt-ft.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        enc_depths=(3, 3, 3, 6, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
