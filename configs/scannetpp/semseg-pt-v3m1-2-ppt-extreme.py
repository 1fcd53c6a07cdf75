# PTv3+PPT extreme recipe evaluated on ScanNet++
# (parity: reference configs/scannetpp/semseg-pt-v3m1-2-ppt-extreme.py)
_base_ = ["../scannet/semseg-pt-v3m1-1-ppt-extreme.py"]

data = dict(
    train=dict(loop=1),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.005, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.005, 0.0005], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0005)]
