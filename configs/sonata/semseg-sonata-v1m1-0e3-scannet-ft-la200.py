# Sonata data-efficient fine-tune on ScanNet (la200)
# (parity: reference configs/sonata/semseg-sonata-v1m1-0e3-scannet-ft-la200.py)
_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points200",
        ignore_index=-1,
    ),
)
