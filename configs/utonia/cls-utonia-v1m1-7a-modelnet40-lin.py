# Utonia linear probing on ModelNet40 classification
# (parity: reference configs/utonia/cls-utonia-v1m1-7a-modelnet40-lin.py)
_base_ = ["../modelnet40/cls-pt-v3m1-0-base.py"]

model = dict(
    backbone_embed_dim=1386,
    freeze_backbone=True,
    backbone=dict(
        _delete_=True,
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=8,
        grid_size=0.05,
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
