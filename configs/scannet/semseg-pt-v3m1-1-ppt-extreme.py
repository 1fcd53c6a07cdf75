# PTv3 + PPT "extreme": joint ScanNet + Structured3D pretraining, validated on
# ScanNet only — the published 78.5 mIoU entry
# (parity: reference configs/scannet/semseg-pt-v3m1-1-ppt-extreme.py).
# Reuses the SpUNet PPT recipe's data/wrapper; swaps in the scaled-up PTv3
# backbone with prompt-driven norms.
_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]

batch_size = 24
num_worker = 48
mix_prob = 0.8
clip_grad = 3.0

point_capacity = 262144  # Structured3D crops up to 204800 points
point_capacity_val = 131072

model = dict(
    type="PPT-v1m1",
    backbone=dict(
        # _delete_ replaces the SpUNet backbone wholesale
        _delete_=True,
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 6, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
        mlp_ratio=4,
        qkv_bias=True,
        qk_scale=None,
        attn_drop=0.0,
        proj_drop=0.0,
        drop_path=0.3,
        shuffle_orders=True,
        pre_norm=True,
        enable_rpe=False,
        enable_flash=True,
        upcast_attention=False,
        upcast_softmax=False,
        enc_mode=False,
        pdnorm_bn=True,
        pdnorm_ln=True,
        pdnorm_decouple=True,
        pdnorm_adaptive=False,
        pdnorm_affine=True,
        pdnorm_conditions=("ScanNet", "S3DIS", "Structured3D"),
        conv_engine="block",
        block_capacity_factor=1.0 / 32.0,
        serialize_depth=11,
        pool_capacity_factors=(0.4, 0.4, 0.4, 0.4),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
    backbone_out_channels=64,
)

epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.005, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR",
    max_lr=[0.005, 0.0005],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0005)]
