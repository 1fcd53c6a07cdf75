# Concerto PTv3-large LoRA fine-tune on scannet
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-0f-scannet-ft-lora.py)
_base_ = ["./semseg-ptv3-large-v1m1-0c-scannet-ft.py"]

model = dict(
    type="DefaultLORASegmentorV2",
    lora_rank=16,
)

optimizer = dict(trainable_keywords=("lora", "seg_head"))
