# Utonia staged multi-domain pretraining — STAGE 1 (indoor + driving + parts)
# (parity: reference configs/utonia/pretrain-utonia-v1m1-0-base_stagev1.py).
# The frozen 2D encoder runs host-side (see concerto config); the teacher
# backbone is Sonata-initialized and FROZEN (sonata_model_type="offline") —
# load Sonata weights into it with the CheckpointLoader remap below.
_base_ = ["../_base_/default_runtime.py"]

crop_h = 518
crop_w = 518
patch_size = 14

batch_size = 256
num_worker = 64
mix_prob = 0.0
clip_grad = 1.0
empty_cache = False
enable_amp = True
evaluate = False

point_capacity = 131072

model = dict(
    type="Utonia-v1m1",
    patch_h=crop_h // patch_size,
    patch_w=crop_w // patch_size,
    max_images=1,
    image_weight_name="dinov2_vitg14_reg",
    image_weight_path="facebook/dinov2-with-registers-giant",
    enc2d_in_channels=1536,
    enc2d_upcast_level=3,
    backbone=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        pre_norm=True,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        shift_coords=None,
        jitter_coords=1.1,
        rescale_coords=1.2,
        serialize_depth=12,
        grid_size=0.01,
    ),
    teacher_custom=dict(attn_drop=0.0, proj_drop=0.0, drop_path=0.0),
    sonata_model_type="offline",
    head_in_channels=1008,  # 432 + 576 at up_cast_level=2
    head_hidden_channels=4096,
    head_embed_channels=256,
    head_num_prototypes=4096,
    num_global_view=2,
    num_local_view=4,
    # grid-unit mask schedule x grid_size (reference :460-462)
    mask_size_start=10.0,
    mask_size_base=40.0,
    mask_size_scale=0.01,
    mask_size_warmup_ratio=0.05,
    mask_ratio_start=0.3,
    mask_ratio_base=0.7,
    mask_ratio_warmup_ratio=0.05,
    teacher_temp_start=0.04,
    teacher_temp_base=0.07,
    teacher_temp_warmup_ratio=0.05,
    student_temp=0.1,
    mask_loss_weight=2 / 10,
    roll_mask_loss_weight=2 / 10,
    unmask_loss_weight=4 / 10,
    enc2d_loss_weight=2 / 10,
    enc2d_cos_shift=True,
    momentum_base=0.996,
    momentum_final=1.0,
    match_max_r=0.08,
    up_cast_level=2,
)

epoch = 100
base_lr = 0.004
optimizer = dict(type="AdamW", lr=base_lr, weight_decay=0.04)
scheduler = dict(
    type="OneCycleLR",
    max_lr=base_lr,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=10000.0,
)

image_encoder = dict(
    model_name="dinov2_vitg14_reg",
    model_weight="facebook/dinov2-with-registers-giant",
    patch_h=crop_h // patch_size,
    patch_w=crop_w // patch_size,
)


def _mv_transform(grid_size=0.01, point_max=102400):
    return [
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
        dict(type="RandomScale", scale=[0.9, 1.1]),
        dict(type="RandomFlip", p=0.5),
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv", mode="train", return_grid_coord=True),
        dict(type="SphereCrop", point_max=point_max, mode="random"),
        dict(type="Copy", keys_dict={"coord": "origin_coord"}),
        dict(type="NormalizeColor"),
        dict(
            type="MultiViewGenerator",
            global_view_num=2,
            global_view_scale=(0.4, 1.0),
            local_view_num=4,
            local_view_scale=(0.1, 0.4),
            global_transform=[
                dict(type="RandomColorJitter", brightness=0.4, contrast=0.4, saturation=0.2, hue=0.02, p=0.8),
                dict(type="RandomColorGrayScale", p=0.2),
                dict(type="RandomColorDrop", p=0.2),
            ],
            local_transform=[
                dict(type="RandomColorJitter", brightness=0.4, contrast=0.4, saturation=0.2, hue=0.02, p=0.8),
                dict(type="RandomColorGrayScale", p=0.2),
                dict(type="RandomColorDrop", p=0.2),
            ],
            view_keys=("coord", "origin_coord", "color", "normal", "correspondence"),
        ),
        dict(
            type="Collect",
            keys=(
                "global_coord", "global_origin_coord", "global_color", "global_normal",
                "global_correspondence", "images", "img_num",
                "local_coord", "local_origin_coord", "local_color", "local_normal",
            ),
            offset_keys_dict=dict(global_offset="global_coord", local_offset="local_coord"),
            global_feat_keys=("global_color", "global_normal", "global_coord"),
            local_feat_keys=("local_color", "local_normal", "local_coord"),
        ),
    ]


_img_kwargs = dict(crop_h=crop_h, crop_w=crop_w, patch_size=patch_size)

data = dict(
    num_classes=0,
    ignore_index=-1,
    names=[],
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(
                type="DefaultImagePointDataset", split="train",
                data_root="data/scannet_image",
                transform=_mv_transform(), test_mode=False, loop=2, **_img_kwargs,
            ),
            dict(
                type="DefaultImagePointDataset", split="train",
                data_root="data/scannetpp_image",
                transform=_mv_transform(), test_mode=False, loop=1, **_img_kwargs,
            ),
            dict(
                type="WaymoImagePointDataset", split="training",
                data_root="data/waymo",
                transform=_mv_transform(grid_size=0.05), test_mode=False, loop=1, **_img_kwargs,
            ),
            dict(
                type="PartNetDataDataset", split="train",
                data_root="data/partnet",
                transform=_mv_transform(point_max=20480), test_mode=False, loop=1,
            ),
        ],
    ),
)

hooks = [
    # Sonata-init: load a converted Sonata checkpoint's student backbone into
    # the frozen Utonia teacher (reference load_sonata, :291-309)
    dict(type="CheckpointLoader", keywords="backbone_module", replacement="teacher_backbone"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SonataHook"),
    dict(type="WeightDecaySchedular", base_value=0.04, final_value=0.2),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.004, type='AdamW', weight_decay=0.04)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.004, 0.00035451752478610026, 0.00039390836087344473, 0.00043767595652604966, 0.0004863066183622774, 0.0005403406870691972, 0.0006003785411879967, 0.000667087267986663, 0.0007412080755407367, 0.0008235645283785963, 0.0009150716981984404, 0.0010167463313316004, 0.0011297181459240004, 0.0012552423843600004, 0.0013947137604000005, 0.0015496819560000003, 0.0017218688400000004, 0.0019131876000000004, 0.002125764, 0.00236196, 0.0026244000000000003, 0.0029160000000000006, 0.0032400000000000003, 0.0036000000000000003, 0.004], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='enc0.block0.', lr=0.00035451752478610026), dict(keyword='enc0.block1.', lr=0.00039390836087344473), dict(keyword='enc0.block2.', lr=0.00043767595652604966), dict(keyword='enc1.block0.', lr=0.0004863066183622774), dict(keyword='enc1.block1.', lr=0.0005403406870691972), dict(keyword='enc1.block2.', lr=0.0006003785411879967), dict(keyword='enc2.block0.', lr=0.000667087267986663), dict(keyword='enc2.block1.', lr=0.0007412080755407367), dict(keyword='enc2.block2.', lr=0.0008235645283785963), dict(keyword='enc3.block0.', lr=0.0009150716981984404), dict(keyword='enc3.block1.', lr=0.0010167463313316004), dict(keyword='enc3.block2.', lr=0.0011297181459240004), dict(keyword='enc3.block3.', lr=0.0012552423843600004), dict(keyword='enc3.block4.', lr=0.0013947137604000005), dict(keyword='enc3.block5.', lr=0.0015496819560000003), dict(keyword='enc3.block6.', lr=0.0017218688400000004), dict(keyword='enc3.block7.', lr=0.0019131876000000004), dict(keyword='enc3.block8.', lr=0.002125764), dict(keyword='enc3.block9.', lr=0.00236196), dict(keyword='enc3.block10.', lr=0.0026244000000000003), dict(keyword='enc3.block11.', lr=0.0029160000000000006), dict(keyword='enc4.block0.', lr=0.0032400000000000003), dict(keyword='enc4.block1.', lr=0.0036000000000000003), dict(keyword='enc4.block2.', lr=0.004)]
