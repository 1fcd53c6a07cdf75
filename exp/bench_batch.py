"""Bench variant: N scenes per device step (amortize fixed per-step costs).

python exp/bench_batch.py [num_scenes]
Same model/geometry as bench.py; capacity scales with num_scenes so per-scene
point budget is unchanged. Reports scenes/sec.
"""

import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def main():
    num_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import jax

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model

    dev = jax.devices()[0]
    cfg, capacity1, _ = B.ptv3_base_cfg(on_tpu=dev.platform == "tpu")
    capacity = capacity1 * num_scenes
    model = build_model(cfg)

    n_distinct = 4
    scene_arrays = [
        B.synthetic_batch(capacity, num_scenes, seed=s * num_scenes) for s in range(n_distinct)
    ]

    def prepare(seed: int):
        return jax.device_put(scene_arrays[seed % n_distinct], dev)

    example = prepare(0)
    jinit = jax.jit(
        lambda rngs, arrays: model.init(rngs, make_point_batch(arrays, num_scenes), train=False)
    )
    variables = jax.block_until_ready(jinit({"params": jax.random.PRNGKey(0)}, example))

    @jax.jit
    def infer(params, batch_stats, arrays):
        pb = make_point_batch(arrays, num_scenes)
        out = model.apply({"params": params, "batch_stats": batch_stats}, pb, train=False)
        return out["seg_logits"]

    params, bs = variables["params"], variables.get("batch_stats", {})
    jax.block_until_ready(infer(params, bs, example))

    iters = max(30 // num_scenes, 8)
    workers = min(4, os.cpu_count() or 4)
    with cf.ThreadPoolExecutor(workers) as pool:
        pending = [pool.submit(prepare, i) for i in range(min(workers, iters))]
        logits = None
        start = time.perf_counter()
        for i in range(iters):
            batch = pending[i % len(pending)].result()
            if i + len(pending) < iters:
                pending[i % len(pending)] = pool.submit(prepare, i + len(pending))
            logits = infer(params, bs, batch)
        jax.block_until_ready(logits)
        elapsed = time.perf_counter() - start

    sps = iters * num_scenes / elapsed
    print(json.dumps({"num_scenes": num_scenes, "scenes_per_sec": round(sps, 3),
                      "ms_per_step": round(1000 * elapsed / iters, 1)}))


if __name__ == "__main__":
    main()
