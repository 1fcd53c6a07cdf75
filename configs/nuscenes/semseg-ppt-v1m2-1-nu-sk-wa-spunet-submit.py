# PPT v1m2 nuScenes benchmark submission
# (parity: reference configs/nuscenes/semseg-ppt-v1m2-1-nu-sk-wa-spunet-submit.py)
_base_ = ["./semseg-ppt-v1m2-0-nu-sk-wa-spunet.py"]

evaluate = False

data = dict(
    test=dict(split="test"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=0.002, pct_start=0.04, type='OneCycleLR')
param_dicts = None
