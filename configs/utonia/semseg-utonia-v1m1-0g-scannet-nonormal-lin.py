# Utonia lin probe on scannet without normal
# (parity: reference configs/utonia/semseg-utonia-v1m1-0g-scannet-nonormal-lin.py)
_base_ = ["./semseg-utonia-v1m1-0a-scannet-lin.py"]

# zero the normal feature channels everywhere (probe robustness ablation)
no_feat = [dict(type="RandomDropNormal", drop_ratio=1.0, drop_application_ratio=1.0)]

data = dict(
    train=dict(extra_transform=no_feat),
    val=dict(extra_transform=no_feat),
    test=dict(extra_transform=no_feat),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
