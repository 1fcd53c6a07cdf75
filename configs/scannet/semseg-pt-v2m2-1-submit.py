# PTv2 ScanNet benchmark submission (train+val, no eval)
# (parity: reference configs/scannet/semseg-pt-v2m2-1-submit.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 900
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.005, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=0.005, pct_start=0.05, type='OneCycleLR')
param_dicts = None
