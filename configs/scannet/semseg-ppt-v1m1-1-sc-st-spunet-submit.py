# PPT SpUNet ScanNet benchmark submission (train+val, no eval)
# (parity: reference configs/scannet/semseg-ppt-v1m1-1-sc-st-spunet-submit.py)
_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
