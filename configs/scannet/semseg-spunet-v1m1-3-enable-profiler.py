# Profiler-enabled SpUNet experiment
# (parity: reference configs/scannet/semseg-spunet-v1m1-3-enable-profiler.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

epoch = 1
eval_epoch = 1

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="RuntimeProfilerV2", wait=1, warmup=1, active=2, repeat=1),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.05, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.05, pct_start=0.05, type='OneCycleLR')
param_dicts = None
