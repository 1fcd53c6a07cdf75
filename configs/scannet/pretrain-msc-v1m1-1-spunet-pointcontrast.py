# PointContrast-style MSC pretrain on ScanNet frame pairs
# (parity: reference configs/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast.py):
# MSC machinery with masking/reconstruction off = plain InfoNCE PointContrast.
_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]

model = dict(
    mask_rate=0.0,
    reconstruct_color=False,
    reconstruct_normal=False,
)

dataset_type = "ScanNetPairDataset"
data = dict(
    train=dict(type=dataset_type, data_root="data/scannet_pair"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 10
eval_epoch = 10
optimizer = dict(_delete_=True, lr=0.1, momentum=0.8, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=10000.0, max_lr=0.1, pct_start=0.01, type='OneCycleLR')
param_dicts = None
