# Utonia-v1m2 distillation into a tiny PT-v3m3 student
# (parity: reference configs/utonia/distill-utonia-v1m2-0-tiny.py)
_base_ = ["../concerto/pretrain-concerto-v1m1-0-base.py"]

model = dict(
    type="Concerto-v1m2_distill",
    head_in_channels_s=216,
    head_in_channels_t=576,
    backbone_s=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(18, 36, 72, 144, 216),
        enc_num_head=(1, 2, 4, 8, 12),
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

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.004, type='AdamW', weight_decay=0.04)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.004, 0.0010167463313316004, 0.0011297181459240004, 0.0012552423843600004, 0.0013947137604000005, 0.0015496819560000003, 0.0017218688400000004, 0.0019131876000000004, 0.002125764, 0.00236196, 0.0026244000000000003, 0.0029160000000000006, 0.0032400000000000003, 0.0036000000000000003, 0.004], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='enc0.block0.', lr=0.0010167463313316004), dict(keyword='enc0.block1.', lr=0.0011297181459240004), dict(keyword='enc1.block0.', lr=0.0012552423843600004), dict(keyword='enc1.block1.', lr=0.0013947137604000005), dict(keyword='enc2.block0.', lr=0.0015496819560000003), dict(keyword='enc2.block1.', lr=0.0017218688400000004), dict(keyword='enc3.block0.', lr=0.0019131876000000004), dict(keyword='enc3.block1.', lr=0.002125764), dict(keyword='enc3.block2.', lr=0.00236196), dict(keyword='enc3.block3.', lr=0.0026244000000000003), dict(keyword='enc3.block4.', lr=0.0029160000000000006), dict(keyword='enc3.block5.', lr=0.0032400000000000003), dict(keyword='enc4.block0.', lr=0.0036000000000000003), dict(keyword='enc4.block1.', lr=0.004)]
