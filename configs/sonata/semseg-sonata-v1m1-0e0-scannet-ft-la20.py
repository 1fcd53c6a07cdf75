# Sonata data-efficient fine-tune on ScanNet (la20)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e0-scannet-ft-la20.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points20",
        ignore_index=-1,
    ),
)
