# Sonata data-efficient fine-tune on ScanNet (lr20)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e7-scannet-ft-lr20.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/20.txt",
        ignore_index=-1,
    ),
)
