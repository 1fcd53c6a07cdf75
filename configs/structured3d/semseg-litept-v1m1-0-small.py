# Small LitePT on Structured3D
# (parity: reference configs/structured3d/semseg-litept-v1m1-0-small.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(
    type="DefaultSegmentorV2",
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=9,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
    backbone_out_channels=64,
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 200
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.012, type='AdamW', weight_decay=0.05)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.012, 0.0012], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0012)]
