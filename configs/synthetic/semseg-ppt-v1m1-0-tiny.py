# Tiny PPT multi-dataset joint training on synthetic scenes (CPU-runnable
# smoke of MultiDatasetTrainer + MultiDatasetDataloader + PDNorm conditions).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 4
num_worker = 0
mix_prob = 0
empty_cache = False
seed = 0

point_capacity = 4096
point_capacity_val = 4096

train = dict(type="MultiDatasetTrainer")

model = dict(
    type="PPT-v1m1",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=0,
        base_channels=8,
        context_channels=16,
        channels=(8, 8, 8, 8, 8, 8, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        conditions=("ScanNet", "Structured3D"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
        serialize_depth=9,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=8,
    context_channels=16,
    conditions=("ScanNet", "Structured3D"),
    template="[x]",
    clip_model="ViT-B/16",
    class_name=(
        "class_0", "class_1", "class_2", "class_3", "class_4",
        "class_5", "class_6", "class_7", "class_8", "class_9",
        "class_10", "class_11", "class_12",
    ),
    valid_index=(tuple(range(13)), tuple(range(13))),
    backbone_mode=False,
)

epoch = 2
eval_epoch = 2
optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001, nesterov=True)
scheduler = dict(type="PolyLR")

_tiny_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train", return_grid_coord=True),
    dict(type="SphereCrop", point_max=1500, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
]

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[f"class_{i}" for i in range(13)],
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(
                type="SyntheticSemSegDataset",
                split="train",
                num_scenes=8,
                num_points=4000,
                num_classes=13,
                transform=_tiny_transform + [
                    dict(type="Add", keys_dict={"condition": "ScanNet"}),
                    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"), feat_keys=("color", "normal")),
                ],
            ),
            dict(
                type="SyntheticSemSegDataset",
                split="train",
                num_scenes=4,
                num_points=4000,
                num_classes=13,
                seed_offset=50,
                transform=_tiny_transform + [
                    dict(type="Add", keys_dict={"condition": "Structured3D"}),
                    dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"), feat_keys=("color", "normal")),
                ],
                loop=2,
            ),
        ],
    ),
    val=dict(
        type="SyntheticSemSegDataset",
        split="val",
        num_scenes=2,
        num_points=4000,
        num_classes=13,
        seed_offset=100,
        transform=_tiny_transform + [
            dict(type="Add", keys_dict={"condition": "ScanNet"}),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "condition"), feat_keys=("color", "normal")),
        ],
    ),
)
