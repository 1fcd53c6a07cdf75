# concerto-large ft benchmark submission on scannetpp (train+val, no eval)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-2e-scannetpp-ft-submit.py)
_base_ = ["./semseg-ptv3-large-v1m1-2c-scannetpp-ft.py"]

evaluate = False

data = dict(
    train=dict(split=('train', 'val')),
    test=dict(split="test"),
)
