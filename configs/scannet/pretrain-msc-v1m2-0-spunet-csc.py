# Contrastive Scene Contexts pretraining (MSC-v1m2 partition-aware loss) on ScanNet pairs
# (parity: reference configs/scannet/pretrain-msc-v1m2-0-spunet-csc.py)
_base_ = ["./pretrain-msc-v1m1-1-spunet-pointcontrast.py"]

model = dict(type="MSC-v1m2")
