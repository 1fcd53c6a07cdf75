# PointGroup PTv3 ScanNet++ submission
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m2-1-ptv3-submit.py)
_base_ = ["./insseg-pointgroup-v1m2-0-ptv3-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0006)]
