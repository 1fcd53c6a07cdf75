# PPT SpUNet ScanNet benchmark submission (train+val, no eval)
# (parity: reference configs/scannet/semseg-ppt-v1m1-1-sc-st-spunet-submit.py)
_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
