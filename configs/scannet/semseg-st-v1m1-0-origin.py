# Stratified Transformer (original v1m1 recipe) on ScanNet
# (parity: reference configs/scannet/semseg-st-v1m1-0-origin.py)
_base_ = ["./semseg-st-v1m2-0-refined.py"]

model = dict(
    backbone=dict(type="ST-v1m1"),
)
