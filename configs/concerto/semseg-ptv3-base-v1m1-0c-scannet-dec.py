# Concerto PTv3-base decoder probe on ScanNet
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-0c-scannet-dec.py)
_base_ = ["./semseg-ptv3-base-v1m1-0a-scannet-lin.py"]

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
