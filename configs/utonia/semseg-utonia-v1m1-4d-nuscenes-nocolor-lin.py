# Utonia lin probe on nuscenes without color
# (parity: reference configs/utonia/semseg-utonia-v1m1-4d-nuscenes-nocolor-lin.py)
_base_ = ["./semseg-utonia-v1m1-4a-nuscenes-lin.py"]

# zero the color feature channels everywhere (probe robustness ablation)
no_feat = [dict(type="RandomDropColor", drop_ratio=1.0, drop_application_ratio=1.0)]

data = dict(
    train=dict(extra_transform=no_feat),
    val=dict(extra_transform=no_feat),
    test=dict(extra_transform=no_feat),
)
