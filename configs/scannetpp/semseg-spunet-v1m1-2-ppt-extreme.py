# PPT SpUNet extreme recipe evaluated on ScanNet++
# (parity: reference configs/scannetpp/semseg-spunet-v1m1-2-ppt-extreme.py)
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

data = dict(
    train=dict(loop=1),
)
