# PointGroup PTv3 ScanNet++ submission
# (parity: reference configs/scannetpp/insseg-pointgroup-v1m2-1-ptv3-submit.py)
_base_ = ["./insseg-pointgroup-v1m2-0-ptv3-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)
