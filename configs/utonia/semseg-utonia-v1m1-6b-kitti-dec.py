# utonia decoder probing on kitti: frozen encoder + light decoder
# (parity: reference configs/utonia/semseg-utonia-v1m1-6b-kitti-dec.py)
_base_ = ["./semseg-utonia-v1m1-6a-kitti-lin.py"]

model = dict(
    backbone_out_channels=54,
    backbone=dict(
        enc_mode=False,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(54, 108, 216, 432),
        dec_num_head=(3, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]
