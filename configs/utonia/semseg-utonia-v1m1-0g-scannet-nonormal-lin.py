# Utonia lin probe on scannet without normal
# (parity: reference configs/utonia/semseg-utonia-v1m1-0g-scannet-nonormal-lin.py)
_base_ = ["./semseg-utonia-v1m1-0a-scannet-lin.py"]

# zero the normal feature channels everywhere (probe robustness ablation)
no_feat = [dict(type="RandomDropNormal", drop_ratio=1.0, drop_application_ratio=1.0)]

data = dict(
    train=dict(extra_transform=no_feat),
    val=dict(extra_transform=no_feat),
    test=dict(extra_transform=no_feat),
)
