# Sonata data-efficient fine-tune on ScanNet (la100)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e2-scannet-ft-la100.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points100",
        ignore_index=-1,
    ),
)
