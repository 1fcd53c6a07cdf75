# Concerto PTv3-large lin probe on nuscenes with image-projected color/normal
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-nuscenes-5a-withcolornormal-lin.py)
_base_ = ["./semseg-ptv3-large-v1m1-nuscenes-5a-lin.py"]

data = dict(
    train=dict(type="NuScenesImagePointDataset", if_img=False),
    val=dict(type="NuScenesImagePointDataset", if_img=False),
    test=dict(type="NuScenesImagePointDataset", if_img=False),
)
