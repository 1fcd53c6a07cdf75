# PTv2 ScanNet++ benchmark submission
# (parity: reference configs/scannetpp/semseg-pt-v2m2-2-submit.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(split="test"),
)
