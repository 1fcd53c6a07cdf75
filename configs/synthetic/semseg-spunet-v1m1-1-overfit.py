# Overfit harness: tiny SpUNet memorizing 8 fixed synthetic scenes.
# See semseg-pt-v3m1-1-overfit.py — same data/schedule, SpUNet backbone
# (covers the gather-GEMM sparse-conv VJPs; tests/test_overfit.py).
_base_ = ["./semseg-pt-v3m1-1-overfit.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    num_classes=6,
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=9,
        num_classes=6,
        base_channels=8,
        channels=(8, 16, 32, 64, 64, 32, 24, 24),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        serialize_depth=10,
        pool_capacity_factor=0.6,
        # The 150-step overfit run is ~20x shorter than any real schedule:
        # at torch-default momentum 0.01 the BN running stats retain
        # 0.99^150 ~= 22% of their init (mean 0 / var 1), so eval-mode
        # normalization diverges from the batch stats training used (train
        # loss 0.007 vs eval mIoU 0.57, r3 VERDICT weak #3). Raising momentum
        # (the knob the reference's v1m2 variant exists for,
        # spconv_unet_v1m2_bn_momentum.py) converges the stats: 0.9^150 ~ 1e-7.
        bn_momentum=0.1,
        transition_bn_momentum=0.1,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(_delete_=True, type="AdamW", lr=0.005, weight_decay=0.0)
