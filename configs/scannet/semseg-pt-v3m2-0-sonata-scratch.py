# PT-v3m2 (sonata architecture: linear stem + mask token) trained from scratch on ScanNet
# (parity: reference configs/scannet/semseg-pt-v3m2-0-sonata-scratch.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        type="PT-v3m2",
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
    ),
)
