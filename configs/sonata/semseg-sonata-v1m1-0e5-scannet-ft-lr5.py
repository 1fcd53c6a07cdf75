# Sonata data-efficient fine-tune on ScanNet (lr5)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e5-scannet-ft-lr5.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/5.txt",
        ignore_index=-1,
    ),
)
