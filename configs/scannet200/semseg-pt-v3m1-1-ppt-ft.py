# PPT-pretrained PTv3 fine-tuned on ScanNet200
# (parity: reference configs/scannet200/semseg-pt-v3m1-1-ppt-ft.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        enc_depths=(3, 3, 3, 6, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.006, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.006, 0.0006], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0006)]
