# SpUNet on ScanNet200 (parity: reference configs/scannet200/semseg-spunet-v1m1-0-base.py)
_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(num_classes=200))

dataset_type = "ScanNet200Dataset"

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],  # canonical 200-class list lives in the dataset
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
