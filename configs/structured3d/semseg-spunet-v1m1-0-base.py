# SpUNet base on Structured3D panoramas
# (parity: reference configs/structured3d/semseg-spunet-v1m1-0-base.py)
_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]

point_capacity = 262144  # sample_rate crops of large panorama rooms
point_capacity_val = 262144

model = dict(backbone=dict(num_classes=25))

epoch = 100
eval_epoch = 100

dataset_type = "Structured3DDataset"
data_root = "data/structured3d"
_names = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand", "sink",
    "lamp", "otherstructure", "otherfurniture", "otherprop",
)

data = dict(
    num_classes=25,
    names=list(_names),
    train=dict(
        type=dataset_type,
        data_root=data_root,
        split="train",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", sample_rate=0.6, mode="random"),
            dict(type="SphereCrop", point_max=204800, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ShufflePoint"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
        ],
    ),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
