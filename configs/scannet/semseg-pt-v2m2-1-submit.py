# PTv2 ScanNet benchmark submission (train+val, no eval)
# (parity: reference configs/scannet/semseg-pt-v2m2-1-submit.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
