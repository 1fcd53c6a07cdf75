# Concerto pretraining with the PTv3-large encoder
# (parity: reference configs/concerto/pretrain-concerto-v1m1-1-large-base.py)
_base_ = ["./pretrain-concerto-v1m1-0-base.py"]

model = dict(
    head_in_channels=1728,  # full up-cast concat width of the large encoder
    backbone=dict(
        in_channels=9,
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
    ),
)
