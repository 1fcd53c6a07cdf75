# concerto-large decoder probing on scannetpp: frozen encoder + light decoder
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-2b-scannetpp-dec.py)
_base_ = ["./semseg-ptv3-large-v1m1-2a-scannetpp-lin.py"]

model = dict(
    backbone_out_channels=64,
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 128, 256, 512),
        dec_num_head=(4, 8, 16, 32),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]
