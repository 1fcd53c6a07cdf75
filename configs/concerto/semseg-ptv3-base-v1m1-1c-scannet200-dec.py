# Concerto PTv3-base dec probe on scannet200
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-1c-scannet200-dec.py)
_base_ = ["./semseg-ptv3-base-v1m1-1a-scannet200-lin.py"]

model = dict(
    backbone_out_channels=64,
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,
)

param_dicts = [dict(keyword="enc", lr=0.0)]
