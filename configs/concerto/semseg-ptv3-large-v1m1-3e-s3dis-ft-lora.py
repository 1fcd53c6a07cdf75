# Concerto PTv3-large LoRA fine-tune on s3dis
# (parity: reference configs/concerto/semseg-ptv3-large-v1m1-3e-s3dis-ft-lora.py)
_base_ = ["./semseg-ptv3-large-v1m1-3c-s3dis-ft.py"]

model = dict(
    type="DefaultLORASegmentorV2",
    lora_rank=16,
)

optimizer = dict(trainable_keywords=("lora", "seg_head"))
