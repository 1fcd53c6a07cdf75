# SPVCNN on SemanticKITTI (parity: reference configs/semantic_kitti/semseg-spvcnn-v1m1-0-base.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SPVCNN",
        in_channels=4,
        out_channels=19,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 2, 2, 2, 2, 2, 2, 2),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)
