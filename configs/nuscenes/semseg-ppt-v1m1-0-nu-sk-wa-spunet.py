# PPT joint outdoor training (nuScenes + SemanticKITTI + Waymo), validated on nuScenes
# (parity: reference configs/nuscenes/semseg-ppt-v1m1-0-nu-sk-wa-spunet.py)
_base_ = ["../semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]

data = dict(
    train=dict(loop=1),
)
