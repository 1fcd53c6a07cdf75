# PointGroup SpUNet ScanNet++ submission
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m1-1-spunet-submit.py)
_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)
