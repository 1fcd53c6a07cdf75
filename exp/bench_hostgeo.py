"""Diagnostic breakdown for the host-geometry path on the real chip.

python exp/bench_hostgeo.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from bench import ptv3_base_cfg, synthetic_batch
    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model
    from pointcept_tpu.ops import host_geometry as hg

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    cfg, capacity, num_scenes = ptv3_base_cfg(on_tpu)
    model = build_model(cfg)
    plan = hg.ptv3_plan(cfg["backbone"], capacity, num_scenes)

    arrays = synthetic_batch(capacity, num_scenes, seed=0)
    t0 = time.perf_counter()
    geo = hg.geometry_arrays(plan, arrays, shuffle_seed=0)
    t_host = time.perf_counter() - t0
    nbytes_geo = sum(v.nbytes for v in geo.values())
    nbytes_raw = sum(np.asarray(v).nbytes for v in arrays.values())
    print(f"host geometry: {t_host*1e3:.1f} ms; geo {nbytes_geo/2**20:.1f} MB; raw {nbytes_raw/2**20:.1f} MB")
    for k, v in sorted(geo.items(), key=lambda kv: -kv[1].nbytes)[:8]:
        print(f"  {k:24s} {v.nbytes/2**20:7.2f} MB {v.dtype}")

    full = {**arrays, **geo}
    example = jax.device_put(full, dev)
    jax.block_until_ready(example)
    pb = make_point_batch({k: jnp.asarray(v) for k, v in example.items()}, num_scenes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    @jax.jit
    def infer(params, batch_stats, arrays):
        pb = make_point_batch(arrays, num_scenes)
        out = model.apply({"params": params, "batch_stats": batch_stats}, pb, train=False)
        return out["seg_logits"]

    params, bs = variables["params"], variables.get("batch_stats", {})
    jax.block_until_ready(infer(params, bs, example))

    n_it = 10
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = infer(params, bs, example)
    jax.block_until_ready(r)
    t_dev = (time.perf_counter() - t0) / n_it
    print(f"device step (geometry resident): {t_dev*1e3:.1f} ms -> {1/t_dev:.2f} scenes/s")

    t0 = time.perf_counter()
    for _ in range(3):
        b = jax.device_put(full, dev)
        jax.block_until_ready(b)
    t_h2d = (time.perf_counter() - t0) / 3
    print(f"H2D full batch (sync): {t_h2d*1e3:.1f} ms ({(nbytes_geo+nbytes_raw)/2**20/1024/t_h2d:.2f} GB/s)")

    t0 = time.perf_counter()
    for _ in range(3):
        b = jax.device_put(arrays, dev)
        jax.block_until_ready(b)
    t_h2d_raw = (time.perf_counter() - t0) / 3
    print(f"H2D raw arrays only: {t_h2d_raw*1e3:.1f} ms")

    print(json.dumps(dict(dev_ms=t_dev * 1e3, h2d_ms=t_h2d * 1e3, host_ms=t_host * 1e3,
                          geo_mb=nbytes_geo / 2**20)))


if __name__ == "__main__":
    main()
