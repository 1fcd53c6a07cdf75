# concerto-large data-efficient fine-tune on scannet (la50)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e9-scannet-ft-lora-la50.py)
_base_ = ["./semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points50",
        ignore_index=-1,
    ),
)
