# concerto-large ppt benchmark submission on scannetpp (train+val, no eval)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-2f-scannetpp-ppt-submit.py)
_base_ = ["./semseg-ptv3-large-v1m1-2d-scannetpp-ppt.py"]

evaluate = False

data = dict(
    train=dict(split=('train', 'val')),
    test=dict(split="test"),
)
