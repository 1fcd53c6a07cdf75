# Concerto linear probing on ScanNet
# (parity: reference configs/concerto/semseg-ptv3-base-v1m1-0a-scannet-lin.py)
_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]

model = dict(
    backbone=dict(in_channels=9),
)

data = dict(
    train=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=102400, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal", "coord")),
        ],
    ),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal", "coord")),
        ],
    ),
    test=dict(
        test_cfg=dict(
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "index"), feat_keys=("color", "normal", "coord")),
            ],
        ),
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
