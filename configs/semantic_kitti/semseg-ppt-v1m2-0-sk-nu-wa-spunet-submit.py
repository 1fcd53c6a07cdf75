# PPT v1m2 SemanticKITTI benchmark submission
# (parity: reference configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet-submit.py)
_base_ = ["./semseg-ppt-v1m2-0-sk-nu-wa-spunet.py"]

evaluate = False

data = dict(
    test=dict(split="test"),
)
