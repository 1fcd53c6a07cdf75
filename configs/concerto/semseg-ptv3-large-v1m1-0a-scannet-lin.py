# Concerto-pretrained PTv3-large linear probing on ScanNet
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0a-scannet-lin.py)
_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]

model = dict(
    backbone_out_channels=1728,  # full up-cast concat width of the large encoder
    backbone=dict(
        in_channels=9,
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
