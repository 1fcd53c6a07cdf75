# Tiny Stratified Transformer on synthetic scenes — smoke-test config (CPU-runnable).
_base_ = ["./semseg-pt-v3m1-0-tiny.py"]

batch_size = 4
mix_prob = 0

point_capacity = 2048  # multiple of patch_size
point_capacity_val = 2048

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="ST-v1m2",
        in_channels=6,
        num_classes=13,
        channels=(16, 16, 32, 32),
        num_heads=(2, 2, 4),
        depths=(1, 1, 1),
        window_size=(0.4, 0.8, 1.6),
        quant_size=(0.05, 0.1, 0.2),
        down_ratio=0.25,
        down_num_sample=8,
        kp_ball_radius=0.125,
        kp_max_neighbor=8,
        kp_grid_size=0.05,
        drop_path_rate=0.1,
        stem=True,
        patch_size=64,
        slab_size=64,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(_delete_=True, type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
param_dicts = None

data = dict(
    train=dict(num_scenes=8, transform=[
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
        dict(type="RandomScale", scale=[0.9, 1.1]),
        dict(type="RandomFlip", p=0.5),
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
        dict(type="SphereCrop", point_max=900, mode="random"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
    ]),
    val=dict(num_scenes=2, transform=[
        dict(type="CenterShift", apply_z=True),
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
        dict(type="SphereCrop", point_max=900, mode="center"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
    ]),
)
