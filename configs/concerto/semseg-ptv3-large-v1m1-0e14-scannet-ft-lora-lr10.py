# concerto-large data-efficient fine-tune on scannet (lr10)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e14-scannet-ft-lora-lr10.py)
_base_ = ["./semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/10.txt",
        ignore_index=-1,
    ),
)
