# Concerto PTv3-large lin probe on waymo with image-projected color/normal
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-waymo-6a-withcolornormal-lin.py)
_base_ = ["./semseg-ptv3-large-v1m1-waymo-6a-lin.py"]

data = dict(
    train=dict(type="WaymoImagePointDataset", if_img=False),
    val=dict(type="WaymoImagePointDataset", if_img=False),
    test=dict(type="WaymoImagePointDataset", if_img=False),
)
