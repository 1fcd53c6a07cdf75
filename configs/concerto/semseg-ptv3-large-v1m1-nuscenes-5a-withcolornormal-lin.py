# Concerto PTv3-large lin probe on nuscenes with image-projected color/normal
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-nuscenes-5a-withcolornormal-lin.py)
_base_ = ["./semseg-ptv3-large-v1m1-nuscenes-5a-lin.py"]

data = dict(
    train=dict(type="NuScenesImagePointDataset", if_img=False),
    val=dict(type="NuScenesImagePointDataset", if_img=False),
    test=dict(type="NuScenesImagePointDataset", if_img=False),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=[0.002, 0.0002], pct_start=0.04, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
