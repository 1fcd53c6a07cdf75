# Utonia dec probe on scannet without color
# (parity: reference configs/utonia/semseg-utonia-v1m1-0e-scannet-nocolor-dec.py)
_base_ = ["./semseg-utonia-v1m1-0b-scannet-dec.py"]

# zero the color feature channels everywhere (probe robustness ablation)
no_feat = [dict(type="RandomDropColor", drop_ratio=1.0, drop_application_ratio=1.0)]

data = dict(
    train=dict(extra_transform=no_feat),
    val=dict(extra_transform=no_feat),
    test=dict(extra_transform=no_feat),
)
