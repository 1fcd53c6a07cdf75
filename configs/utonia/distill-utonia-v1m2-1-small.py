# Utonia-v1m2 distillation into a small PT-v3m3 student
# (parity: reference configs/utonia/distill-utonia-v1m2-1-small.py)
_base_ = ["../concerto/pretrain-concerto-v1m1-0-base.py"]

model = dict(
    type="Concerto-v1m2_distill",
    head_in_channels_s=432,
    head_in_channels_t=576,
    backbone_s=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(36, 72, 144, 288, 432),
        enc_num_head=(2, 4, 8, 16, 24),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,
    ),
    backbone_t=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,
    ),
)

train = dict(type="PartialSampledTrainer")
