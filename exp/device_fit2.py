"""Fold-proof device-time fit + dispatch-overhead microbench.

1) Serial in-graph repetition of the full B-scene forward, with a runtime-
   opaque zero (min(|carry|*1e-30, 0)) added to EVERY model input (feat f32,
   grid_coord/batch int) so XLA can neither dedup iterations nor hoist any
   stage out of the scan loop.
2) A trivial jitted fn taking the same params tree, timed per call — isolates
   the axon-tunnel per-dispatch cost (arg marshalling scales with leaf count).

python exp/device_fit2.py
"""

import functools
import os
import sys
import time

print_ = functools.partial(print, flush=True)

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
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print_(f"params leaves: {n_leaves}")

    # --- dispatch overhead microbench ---
    @jax.jit
    def touch(p, a):
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + x.reshape(-1)[0].astype(jnp.float32), p, jnp.float32(0)
        ) + a["feat"].reshape(-1)[0]

    jax.block_until_ready(touch(params, arrays))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(touch(params, arrays))
    print_(f"dispatch(params tree + arrays): {(time.perf_counter()-t0)/10*1e3:.1f} ms/call")

    @jax.jit
    def touch_small(x):
        return x + 1.0

    small = jnp.zeros((8,))
    jax.block_until_ready(touch_small(small))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(touch_small(small))
    print_(f"dispatch(1 small arg): {(time.perf_counter()-t0)/10*1e3:.1f} ms/call")

    # --- fold-proof serial repetition ---
    def one(a, carry):
        zf = jnp.minimum(jnp.abs(carry) * 1e-30, 0.0)  # runtime 0.0, not foldable
        zi = zf.astype(jnp.int32)  # runtime 0
        a = dict(a)
        for k, v in a.items():
            a[k] = v + (zi if jnp.issubdtype(v.dtype, jnp.integer) else zf.astype(v.dtype))
        pb = make_point_batch(a, num_scenes)
        out = model.apply({"params": params, "batch_stats": bs}, pb, train=False)
        return out["seg_logits"].astype(jnp.float32).mean()

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
        jax.block_until_ready(f(arrays))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            jax.block_until_ready(f(arrays))
        results[n] = (time.perf_counter() - t0) / reps * 1e3
        print_(f"R={n}: {results[n]:.1f} ms/call")

    step_ms = (results[5] - results[1]) / 4
    print_(
        f"device step: {step_ms:.1f} ms for {num_scenes} scenes"
        f" = {step_ms / num_scenes:.1f} ms/scene = {1000 * num_scenes / step_ms:.2f} scenes/s"
    )


if __name__ == "__main__":
    main()
