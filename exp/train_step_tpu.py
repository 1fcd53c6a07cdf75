"""One PTv3-base TRAINING step at ScanNet scale on the real chip.

Evidence that the full backward (flash-attention chunked bwd, block-conv VJP,
pooling/partition grads, optimizer) compiles and runs at production shape.
Reports steady-state ms/step (serial dependence through the optimizer state).

python exp/train_step_tpu.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from bench import ptv3_base_cfg, synthetic_batch
    from pointcept_tpu.engines.train import TrainState, build_train_step, make_point_batch
    from pointcept_tpu.models import build_model

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg, capacity, num_scenes = ptv3_base_cfg(on_tpu)
    cfg["backbone"]["drop_path"] = 0.0  # keep the graph deterministic-ish
    model = build_model(cfg)

    batch = synthetic_batch(capacity, num_scenes, seed=0)
    arrays = {k: jnp.asarray(v)[None] for k, v in batch.items()}  # leading device axis
    pb = make_point_batch({k: v[0] for k, v in arrays.items()}, num_scenes)
    t0 = time.time()
    jinit = jax.jit(
        lambda rngs, a: model.init(rngs, make_point_batch(a, num_scenes), train=False)
    )
    variables = jax.block_until_ready(
        jinit(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            {k: v[0] for k, v in arrays.items()},
        )
    )
    print(f"init in {time.time() - t0:.0f}s", flush=True)

    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step = build_train_step(model, tx, num_scenes, mesh)

    t0 = time.time()
    state, metrics = step(state, arrays, jax.random.PRNGKey(7))
    jax.block_until_ready(state.params)
    print(f"first step (compile) in {time.time() - t0:.0f}s, loss={float(metrics['loss']):.4f}", flush=True)

    t0 = time.time()
    reps = 5
    for i in range(reps):
        state, metrics = step(state, arrays, jax.random.PRNGKey(8 + i))
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / reps * 1000
    print(f"steady-state train step: {dt:.0f} ms ({1000/dt:.2f} scenes/s), "
          f"loss={float(metrics['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
