# PointGroup SpUNet ScanNet++ submission
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m1-1-spunet-submit.py)
_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
