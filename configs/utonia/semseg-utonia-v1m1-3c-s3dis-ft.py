# utonia full fine-tune on s3dis
# (parity: reference configs/utonia/semseg-utonia-v1m1-3c-s3dis-ft.py)
_base_ = ["./semseg-utonia-v1m1-3a-s3dis-lin.py"]

model = dict(
    freeze_backbone=False,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
eval_epoch = 100
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 3000
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.01)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.001, 0.0001], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0001)]
