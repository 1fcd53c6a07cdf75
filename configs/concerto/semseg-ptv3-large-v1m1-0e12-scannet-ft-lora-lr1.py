# concerto-large data-efficient fine-tune on scannet (lr1)
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0e12-scannet-ft-lora-lr1.py)
_base_ = ["./semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/1.txt",
        ignore_index=-1,
    ),
)
