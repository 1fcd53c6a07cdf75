# Small LitePT (v1m2 recipe: longer schedule + lovasz) on ScanNet
# (parity: reference configs/scannet/semseg-litept-v1m2-0-small.py)
_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
