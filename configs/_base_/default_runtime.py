# Default runtime schema (parity: reference configs/_base_/default_runtime.py)
weight = None  # path to checkpoint dir for weight-only load
resume = False  # resume training state from weight
evaluate = True  # eval after each "epoch" (eval_epoch compression)
test_only = False

seed = None  # random if None
save_path = "exp/default"
num_worker = 8
batch_size = 8  # total across all hosts
batch_size_val = None  # auto: one scene/device
batch_size_test = None
epoch = 100  # total dataset passes
eval_epoch = 100  # eval epochs (loop = epoch // eval_epoch)
clip_grad = None
sync_bn = False  # BN stats psum over mesh when True
enable_amp = False  # accepted for parity; bf16 policy is per-model
amp_dtype = "bfloat16"
empty_cache = False
enable_wandb = False  # opt-in (no-op without the wandb package / network)
wandb_project = "pointcept_tpu"
find_unused_parameters = False  # parity no-op

mix_prob = 0
param_dicts = None

# TPU-specific static-shape knobs
point_capacity = 131072  # max points per device-batch
point_capacity_val = None  # defaults to point_capacity

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

train = dict(type="DefaultTrainer")
test = dict(type="SemSegTester", verbose=True)
