# Swin3D large on ScanNet
# (parity: reference configs/scannet/semseg-swin3d-v1m1-1-large.py)
_base_ = ["./semseg-swin3d-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        depths=(2, 4, 9, 4, 4),
        channels=(80, 160, 320, 640, 640),
        num_heads=(10, 10, 20, 40, 40),
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='blocks', lr=0.0006)]
