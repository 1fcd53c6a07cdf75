# Concerto pretraining with the PTv3-large encoder
# (parity: reference configs/concerto/pretrain-concerto-v1m1-1-large-base.py)
_base_ = ["./pretrain-concerto-v1m1-0-base.py"]

model = dict(
    head_in_channels=1728,  # full up-cast concat width of the large encoder
    backbone=dict(
        in_channels=9,
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
    ),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, lr=0.004, type='AdamW', weight_decay=0.04)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=1000.0, max_lr=[0.004, 0.00035451752478610026, 0.00039390836087344473, 0.00043767595652604966, 0.0004863066183622774, 0.0005403406870691972, 0.0006003785411879967, 0.000667087267986663, 0.0007412080755407367, 0.0008235645283785963, 0.0009150716981984404, 0.0010167463313316004, 0.0011297181459240004, 0.0012552423843600004, 0.0013947137604000005, 0.0015496819560000003, 0.0017218688400000004, 0.0019131876000000004, 0.002125764, 0.00236196, 0.0026244000000000003, 0.0029160000000000006, 0.0032400000000000003, 0.0036000000000000003, 0.004], pct_start=0.05, type='OneCycleLR')
param_dicts = [dict(keyword='enc0.block0.', lr=0.00035451752478610026), dict(keyword='enc0.block1.', lr=0.00039390836087344473), dict(keyword='enc0.block2.', lr=0.00043767595652604966), dict(keyword='enc1.block0.', lr=0.0004863066183622774), dict(keyword='enc1.block1.', lr=0.0005403406870691972), dict(keyword='enc1.block2.', lr=0.0006003785411879967), dict(keyword='enc2.block0.', lr=0.000667087267986663), dict(keyword='enc2.block1.', lr=0.0007412080755407367), dict(keyword='enc2.block2.', lr=0.0008235645283785963), dict(keyword='enc3.block0.', lr=0.0009150716981984404), dict(keyword='enc3.block1.', lr=0.0010167463313316004), dict(keyword='enc3.block2.', lr=0.0011297181459240004), dict(keyword='enc3.block3.', lr=0.0012552423843600004), dict(keyword='enc3.block4.', lr=0.0013947137604000005), dict(keyword='enc3.block5.', lr=0.0015496819560000003), dict(keyword='enc3.block6.', lr=0.0017218688400000004), dict(keyword='enc3.block7.', lr=0.0019131876000000004), dict(keyword='enc3.block8.', lr=0.002125764), dict(keyword='enc3.block9.', lr=0.00236196), dict(keyword='enc3.block10.', lr=0.0026244000000000003), dict(keyword='enc3.block11.', lr=0.0029160000000000006), dict(keyword='enc4.block0.', lr=0.0032400000000000003), dict(keyword='enc4.block1.', lr=0.0036000000000000003), dict(keyword='enc4.block2.', lr=0.004)]
