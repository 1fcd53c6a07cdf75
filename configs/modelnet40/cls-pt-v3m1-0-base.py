# PTv3-small classification on ModelNet40 (BASELINE config #1; parity:
# reference configs/modelnet40/cls-ptv3-v1m1-0-base.py)
_base_ = ["../_base_/default_runtime.py"]

batch_size = 32
batch_size_val = 8
num_worker = 16
mix_prob = 0
empty_cache = False
enable_amp = False

point_capacity = 8192  # 1024-pt clouds x 4 scenes/device + slack
point_capacity_val = 8192

model = dict(
    type="DefaultClassifier",
    num_classes=40,
    backbone_embed_dim=512,
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        pre_norm=True,
        enc_mode=True,
        serialize_depth=7,  # 1/0.01 = 100 < 128 grid cells
        pool_capacity_factors=(0.6, 0.6, 0.6, 0.6),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, label_smoothing=0.2, ignore_index=-1)],
)

epoch = 300
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(type="CosineAnnealingLR", eta_min=0.00001)

dataset_type = "ModelNetDataset"
data_root = "data/modelnet40_normal_resampled"

data = dict(
    num_classes=40,
    ignore_index=-1,
    names=[
        "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
        "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
        "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
        "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
        "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
        "toilet", "tv_stand", "vase", "wardrobe", "xbox",
    ],
    train=dict(
        type=dataset_type,
        split="train",
        data_root=data_root,
        num_points=1024,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomShift", shift=((-0.2, 0.2), (-0.2, 0.2), (-0.2, 0.2))),
            dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
        ],
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        num_points=1024,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
        ],
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        num_points=1024,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
        ],
        test_mode=False,
    ),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
test = dict(type="ClsTester")
