"""Benchmark: PTv3-base inference throughput on ScanNet-scale synthetic scenes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: full-resolution val scenes/sec/chip on the flagship PTv3 backbone
(ScanNet-like scenes: ~102k grid-sampled points @ 0.02 m, in_channels=6,
4 serialization orders, patch 1024 — the `configs/scannet/semseg-pt-v3m1-0-base`
geometry).

Baseline: the reference repo publishes no latency numbers (SURVEY.md §6); the
A100 anchor is PTv3's published ~44 ms/scene ScanNet inference latency
(≈22.7 scenes/sec). BASELINE.json targets >=2x A100/chip, so
vs_baseline = scenes_per_sec / (2 * 22.7)  (1.0 = target met).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_SCENES_PER_SEC = 22.7
TARGET_MULTIPLier = 2.0


def main():
    import jax

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_arrays
    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model

    on_tpu = jax.devices()[0].platform == "tpu"
    # full-size PTv3 on TPU; shrunk geometry on CPU (so the script runs anywhere)
    if on_tpu:
        capacity, num_scenes, patch = 102400, 1, 1024
        backbone = dict(
            type="PT-v3m1",
            in_channels=6,
            order=("z", "z-trans", "hilbert", "hilbert-trans"),
            stride=(2, 2, 2, 2),
            enc_depths=(2, 2, 2, 6, 2),
            enc_channels=(32, 64, 128, 256, 512),
            enc_num_head=(2, 4, 8, 16, 32),
            enc_patch_size=(patch,) * 5,
            dec_depths=(2, 2, 2, 2),
            dec_channels=(64, 64, 128, 256),
            dec_num_head=(4, 4, 8, 16),
            dec_patch_size=(patch,) * 4,
            mlp_ratio=4,
            drop_path=0.0,
            serialize_depth=10,
            pool_capacity_factors=(0.35, 0.35, 0.35, 0.35),
        )
    else:
        capacity, num_scenes, patch = 8192, 1, 128
        backbone = dict(
            type="PT-v3m1",
            in_channels=6,
            order=("z", "z-trans", "hilbert", "hilbert-trans"),
            stride=(2, 2),
            enc_depths=(1, 1, 1),
            enc_channels=(32, 64, 128),
            enc_num_head=(2, 4, 8),
            enc_patch_size=(patch,) * 3,
            dec_depths=(1, 1),
            dec_channels=(32, 64),
            dec_num_head=(2, 4),
            dec_patch_size=(patch,) * 2,
            mlp_ratio=4,
            drop_path=0.0,
            serialize_depth=10,
            pool_capacity_factors=(0.5, 0.5),
        )

    cfg = dict(
        type="DefaultSegmentorV2",
        num_classes=20,
        backbone_out_channels=64,
        backbone=backbone,
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    )
    model = build_model(cfg)

    batch = _synthetic_arrays(capacity=capacity, num_scenes=num_scenes, num_classes=20, grid_size=0.02)
    batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    pb = make_point_batch(arrays, num_scenes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    @jax.jit
    def infer(params, batch_stats, arrays):
        pb = make_point_batch(arrays, num_scenes)
        out = model.apply({"params": params, "batch_stats": batch_stats}, pb, train=False)
        return out["seg_logits"]

    params, bs = variables["params"], variables.get("batch_stats", {})
    # warmup / compile
    logits = infer(params, bs, arrays)
    jax.block_until_ready(logits)

    iters = 20 if on_tpu else 3
    start = time.perf_counter()
    for _ in range(iters):
        logits = infer(params, bs, arrays)
    jax.block_until_ready(logits)
    elapsed = time.perf_counter() - start

    scenes_per_sec = iters * num_scenes / elapsed
    print(
        json.dumps(
            {
                "metric": "scannet_val_scenes_per_sec_per_chip" if on_tpu else "cpu_smoke_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(scenes_per_sec / (TARGET_MULTIPLier * A100_SCENES_PER_SEC), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
