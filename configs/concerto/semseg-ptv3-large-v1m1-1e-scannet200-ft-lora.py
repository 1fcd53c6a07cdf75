# Concerto PTv3-large LoRA fine-tune on scannet200
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-1e-scannet200-ft-lora.py)
_base_ = ["./semseg-ptv3-large-v1m1-1c-scannet200-ft.py"]

model = dict(
    type="DefaultLORASegmentorV2",
    lora_rank=16,
)

optimizer = dict(trainable_keywords=("lora", "seg_head"))
