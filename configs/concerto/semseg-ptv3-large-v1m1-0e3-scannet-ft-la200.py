# concerto-large data-efficient fine-tune on scannet (la200)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e3-scannet-ft-la200.py)
_base_ = ["./semseg-ptv3-large-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points200",
        ignore_index=-1,
    ),
)
