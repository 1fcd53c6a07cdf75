"""Honest device-time fit for the bench model: serial in-graph repetition.

Runs the full B-scene forward R times inside ONE jitted graph with a data
dependence between iterations (coord perturbed by 0*prev), so the runtime
cannot dedup or overlap host RPC. Fit: (t(R2)-t(R1))/(R2-R1) = device
ms/step, free of the ~24 ms tunnel floor and H2D streaming.

python exp/device_fit.py
"""

import os
import sys
import time
import functools
print_=functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def main():
    import jax

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model

    dev = jax.devices()[0]
    cfg, capacity, num_scenes = B.ptv3_base_cfg(on_tpu=dev.platform == "tpu")
    model = build_model(cfg)

    arrays = jax.device_put(B.synthetic_batch(capacity, num_scenes, seed=0), dev)
    arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    jinit = jax.jit(
        lambda rngs, a: model.init(rngs, make_point_batch(a, num_scenes), train=False)
    )
    print_("init...")
    variables = jax.block_until_ready(jinit({"params": jax.random.PRNGKey(0)}, arrays))
    params, bs = variables["params"], variables.get("batch_stats", {})

    def one(a, carry):
        a = dict(a)
        a["coord"] = a["coord"] + 0.0 * carry
        pb = make_point_batch(a, num_scenes)
        out = model.apply({"params": params, "batch_stats": bs}, pb, train=False)
        return out["seg_logits"].mean()

    def repeat(n):
        @jax.jit
        def f(a):
            def body(carry, _):
                return one(a, carry), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        return f

    results = {}
    for n in (1, 5):
        f = repeat(n)
        print_(f"compiling R={n}...")
        jax.block_until_ready(f(arrays))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            jax.block_until_ready(f(arrays))
        results[n] = (time.perf_counter() - t0) / reps * 1e3
        print_(f"R={n}: {results[n]:.1f} ms/call")

    step_ms = (results[5] - results[1]) / 4
    print(
        f"device step: {step_ms:.1f} ms for {num_scenes} scenes"
        f" = {step_ms / num_scenes:.1f} ms/scene = {1000 * num_scenes / step_ms:.2f} scenes/s"
    )


if __name__ == "__main__":
    main()
