# PointGroup SpUNet instance segmentation on ScanNet++
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m1-0-spunet-base.py)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(semantic_num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.1, momentum=0.9, nesterov=True, type='SGD', weight_decay=0.0001)
scheduler = dict(_delete_=True, type='PolyLR')
param_dicts = None
