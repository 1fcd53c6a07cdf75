# Tiny PTv3 classifier on synthetic clouds — smoke-test config (CPU-runnable).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 8
batch_size_val = 8
num_worker = 0
mix_prob = 0
seed = 0

point_capacity = 2048
point_capacity_val = 2048

model = dict(
    type="DefaultClassifier",
    num_classes=4,
    backbone_embed_dim=32,
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 32),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(64, 64, 64),
        mlp_ratio=2,
        drop_path=0.0,
        enc_mode=True,
        serialize_depth=7,
        pool_capacity_factors=(0.6, 0.6),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 2
eval_epoch = 2
optimizer = dict(type="AdamW", lr=0.005, weight_decay=0.01)
scheduler = dict(type="CosineAnnealingLR", eta_min=0.0001)

dataset_type = "SyntheticClsDataset"

data = dict(
    num_classes=4,
    ignore_index=-1,
    names=["c0", "c1", "c2", "c3"],
    train=dict(
        type=dataset_type,
        split="train",
        num_clouds=32,
        num_points=256,
        num_classes=4,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
        ],
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        num_clouds=16,
        num_points=256,
        num_classes=4,
        seed_offset=1000,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
        ],
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="val",
        num_clouds=8,
        num_points=256,
        num_classes=4,
        seed_offset=1000,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
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
