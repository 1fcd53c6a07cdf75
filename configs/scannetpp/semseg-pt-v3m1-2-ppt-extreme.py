# PTv3+PPT extreme recipe evaluated on ScanNet++
# (parity: reference configs/scannetpp/semseg-pt-v3m1-2-ppt-extreme.py)
_base_ = ["../scannet/semseg-pt-v3m1-1-ppt-extreme.py"]

data = dict(
    train=dict(loop=1),
)
