# PointContrast-style MSC pretrain on ScanNet frame pairs
# (parity: reference configs/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast.py):
# MSC machinery with masking/reconstruction off = plain InfoNCE PointContrast.
_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]

model = dict(
    mask_rate=0.0,
    reconstruct_color=False,
    reconstruct_normal=False,
)

dataset_type = "ScanNetPairDataset"
data = dict(
    train=dict(type=dataset_type, data_root="data/scannet_pair"),
)
