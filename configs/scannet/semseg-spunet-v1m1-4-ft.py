# SpUNet fine-tune from pretrained weights (MSC et al.)
# (parity: reference configs/scannet/semseg-spunet-v1m1-4-ft.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

weight = "exp/scannet/pretrain-msc-v1m1-0-spunet-base/model/model_last"
epoch = 800
eval_epoch = 100

hooks = [
    dict(type="CheckpointLoader", keywords="backbone_module", replacement="backbone_module"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
