# Sonata data-efficient fine-tune on ScanNet (lr1)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e4-scannet-ft-lr1.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/1.txt",
        ignore_index=-1,
    ),
)
