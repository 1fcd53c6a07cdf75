# PPT SpUNet extreme recipe evaluated on ScanNet++
# (parity: reference configs/scannetpp/semseg-spunet-v1m1-2-ppt-extreme.py)
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

data = dict(
    train=dict(loop=1),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
