# concerto-large data-efficient fine-tune on scannet (lr1)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e4-scannet-ft-lr1.py)
_base_ = ["./semseg-ptv3-large-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/1.txt",
        ignore_index=-1,
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.02)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.002, 0.0002], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='block', lr=0.0002)]
