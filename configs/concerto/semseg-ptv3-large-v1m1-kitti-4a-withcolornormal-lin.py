# Concerto PTv3-large lin probe on kitti with image-projected color/normal
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-kitti-4a-withcolornormal-lin.py)
_base_ = ["./semseg-ptv3-large-v1m1-kitti-4a-lin.py"]

data = dict(
    train=dict(type="SemanticKITTIImagePointDataset", if_img=False),
    val=dict(type="SemanticKITTIImagePointDataset", if_img=False),
    test=dict(type="SemanticKITTIImagePointDataset", if_img=False),
)
