# sonata ppt benchmark submission on scannetpp (train+val, no eval)
# (parity: reference configs/sonata/semseg-sonata-v1m1-2f-scannetpp-ppt-submit.py)
_base_ = ["./semseg-sonata-v1m1-2d-scannetpp-ppt.py"]

evaluate = False

data = dict(
    train=dict(split=('train', 'val')),
    test=dict(split="test"),
)
