# Profiler-enabled SpUNet experiment
# (parity: reference configs/scannet/semseg-spunet-v1m1-3-enable-profiler.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

epoch = 1
eval_epoch = 1

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="RuntimeProfilerV2", wait=1, warmup=1, active=2, repeat=1),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
