# SpUNet base on Matterport3D
# (parity: reference configs/matterport3d/semseg-spunet-v1m1-0-base.py)
_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(num_classes=21))

epoch = 100
eval_epoch = 100

dataset_type = "MatterportDataset"
data_root = "data/matterport3d"
_names = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub", "other",
    "ceiling",
)

data = dict(
    num_classes=21,
    names=list(_names),
    train=dict(type=dataset_type, data_root=data_root, split="train"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
