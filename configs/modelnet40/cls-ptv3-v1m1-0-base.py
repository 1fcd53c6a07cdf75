# PTv3 ModelNet40 classification (reference's alternate file name for the ptv3 cls recipe)
# (parity: reference configs/modelnet40/cls-ptv3-v1m1-0-base.py)
_base_ = ["./cls-pt-v3m1-0-base.py"]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 300
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.01)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.001, 0.0001], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0001)]
