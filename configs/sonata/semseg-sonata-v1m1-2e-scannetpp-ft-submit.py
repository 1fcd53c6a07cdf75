# sonata ft benchmark submission on scannetpp (train+val, no eval)
# (parity: reference configs/sonata/semseg-sonata-v1m1-2e-scannetpp-ft-submit.py)
_base_ = ["./semseg-sonata-v1m1-2c-scannetpp-ft.py"]

evaluate = False

data = dict(
    train=dict(split=('train', 'val')),
    test=dict(split="test"),
)
