# concerto-large data-efficient fine-tune on scannet (la100)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e10-scannet-ft-lora-la100.py)
_base_ = ["./semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points100",
        ignore_index=-1,
    ),
)
