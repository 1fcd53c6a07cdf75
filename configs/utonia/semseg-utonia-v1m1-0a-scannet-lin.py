# Utonia linear probing on ScanNet
# (parity: reference configs/utonia/semseg-utonia-v1m1-0a-scannet-lin.py)
_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]

model = dict(
    backbone_out_channels=1386,  # utonia widths 54/108/216/432/576
    backbone=dict(
        type="PT-v3m3",
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        in_channels=9,
        mask_token=True,
        rope_base=10.0,
    ),
)
