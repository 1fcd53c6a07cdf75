# Utonia lin_hard probe on ScanObjectNN (hardest)
# (parity: reference configs/utonia/cls-utonia-v1m1-8c-scanobjectnn-lin_hard.py)
_base_ = ["./cls-utonia-v1m1-7a-modelnet40-lin.py"]

model = dict(num_classes=15)

data = dict(
    num_classes=15,
    names=[
        "bag", "bin", "box", "cabinet", "chair", "desk", "display", "door",
        "shelf", "table", "bed", "pillow", "sink", "sofa", "toilet",
    ],
    train=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
    val=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
    test=dict(type="ScanObjectNNHardestDataset", data_root="data/scanobjectnn"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 300
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.001, type='AdamW', weight_decay=0.01)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.001, 0.0001], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0001)]
