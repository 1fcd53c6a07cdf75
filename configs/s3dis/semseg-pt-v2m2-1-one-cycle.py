# PTv2 on S3DIS with a OneCycle schedule
# (parity: reference configs/s3dis/semseg-pt-v2m2-1-one-cycle.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

epoch = 3000
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=[0.006, 0.0006],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0006)]
