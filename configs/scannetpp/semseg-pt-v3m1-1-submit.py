# ScanNet++ benchmark submission (no eval; writes the submission format)
# (parity: reference configs/scannetpp/semseg-pt-v3m1-1-submit.py)
_base_ = ["./semseg-pt-v3m1-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(split="test", type="ScanNetPPDataset"),
)
