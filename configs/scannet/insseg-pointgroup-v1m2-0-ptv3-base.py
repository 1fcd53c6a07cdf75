# PointGroup-v1m2 (PTv3 backbone) instance segmentation on ScanNet
# (parity: reference configs/scannet/insseg-pointgroup-v1m2-0-ptv3-base.py)
_base_ = ["../scannetpp/insseg-pointgroup-v1m2-0-ptv3-base.py"]

model = dict(semantic_num_classes=20)

data = dict(
    num_classes=20,
    train=dict(type="ScanNetDataset", data_root="data/scannet"),
    val=dict(type="ScanNetDataset", data_root="data/scannet"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0006)]
