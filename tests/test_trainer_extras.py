import numpy as np
import jax
import jax.numpy as jnp


def test_sync_bn_stats_match_global():
    from jax.sharding import Mesh, PartitionSpec as P
    from pointcept_tpu.models.modules import MaskedBatchNorm

    rng = np.random.RandomState(0)
    x = rng.randn(8, 32, 4).astype(np.float32)  # 8 shards x 32 points x 4 ch
    mask = rng.rand(8, 32) < 0.8

    bn = MaskedBatchNorm(momentum=0.5, sync_axis="data")
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), jnp.asarray(mask[0]), False)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def f(params, xs, ms):
        out, upd = bn.apply(params, xs[0], ms[0], True, mutable=["batch_stats"])
        return upd["batch_stats"]

    stats = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P(), P("data"), P("data")), out_specs=P(),
                      check_vma=False)
    )(v, jnp.asarray(x), jnp.asarray(mask))
    # global (all shards pooled) stats
    flat = x.reshape(-1, 4)[mask.reshape(-1)]
    gm = flat.mean(0)
    gv = flat.var(0) * flat.shape[0] / max(flat.shape[0] - 1, 1)  # unbiased for running
    np.testing.assert_allclose(np.asarray(stats["mean"]), 0.5 * gm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]), 0.5 + 0.5 * gv, rtol=1e-3, atol=1e-4)


def test_grad_accum_steps_builds():
    # optax.MultiSteps path: updates are zero until every k-th step
    import optax

    tx = optax.MultiSteps(optax.sgd(1.0), every_k_schedule=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    up1, state = tx.update(g, state, params)
    assert float(jnp.abs(up1["w"]).sum()) == 0.0  # accumulated, not applied
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).sum()) > 0.0  # applied on 2nd microstep
