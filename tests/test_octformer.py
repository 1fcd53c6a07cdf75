import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.engines.train import make_point_batch
from pointcept_tpu.models import build_model


def make_batch(capacity=512, seed=0):
    rng = np.random.RandomState(seed)
    n1, n2 = 200, 150
    coord = np.zeros((capacity, 3), np.float32)
    coord[: n1 + n2] = rng.rand(n1 + n2, 3) * 3
    grid = np.zeros((capacity, 3), np.int32)
    grid[: n1 + n2] = (coord[: n1 + n2] / 0.05).astype(np.int32)
    feat = np.zeros((capacity, 6), np.float32)
    feat[: n1 + n2] = rng.randn(n1 + n2, 6)
    batch = np.full(capacity, -1, np.int32)
    batch[:n1] = 0
    batch[n1 : n1 + n2] = 1
    segment = np.full(capacity, -1, np.int32)
    segment[: n1 + n2] = rng.randint(0, 5, n1 + n2)
    arrays = dict(
        coord=jnp.asarray(coord), grid_coord=jnp.asarray(grid), feat=jnp.asarray(feat),
        batch=jnp.asarray(batch), segment=jnp.asarray(segment),
    )
    return make_point_batch(arrays, 2)


def octformer_cfg():
    return dict(
        type="OctFormer-v1m1",
        in_channels=6,
        num_classes=5,
        fpn_channels=16,
        channels=(16, 32, 32),
        num_blocks=(1, 1, 1),
        num_heads=(2, 4, 4),
        patch_size=8,
        stem_down=2,
        head_up=2,
        dilation=2,
        drop_path=0.1,
        serialize_depth=8,
        level_capacity_factor=0.6,
    )


def test_octformer_forward_and_grad():
    model = build_model(octformer_cfg())
    pb = make_batch()
    params = model.init(jax.random.PRNGKey(0), pb, train=False)
    out, _ = model.apply(params, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    logits = out.feat
    assert logits.shape == (512, 5)
    valid = np.asarray(pb.batch) >= 0
    assert np.isfinite(np.asarray(logits)[valid]).all()

    def loss_fn(p):
        o, _ = model.apply(p, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
        seg = pb.segment
        m = seg >= 0
        lp = jax.nn.log_softmax(o.feat, -1)
        return -(jnp.where(m, jnp.take_along_axis(lp, jnp.maximum(seg, 0)[:, None], 1)[:, 0], 0).sum()
                 / jnp.maximum(m.sum(), 1))

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(l, np.float64)).all() for l in jax.tree_util.tree_leaves(g))
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    rpe = [np.abs(np.asarray(v)).sum() for kp, v in flat if "rpe_table" in str(kp)]
    assert rpe and sum(rpe) > 0


def test_octformer_dilation_regroup_is_permutation():
    # the dilated regroup/ungroup used in OctreeAttention must be inverse bijections
    n_pad, k, dil = 64, 8, 4
    block = k * dil
    a = jnp.arange(n_pad)
    g = a.reshape(n_pad // block, k, dil)
    g = jnp.moveaxis(g, 2, 1).reshape(n_pad // k, k)
    back = jnp.moveaxis(g.reshape(n_pad // block, dil, k), 1, 2).reshape(n_pad)
    np.testing.assert_array_equal(np.asarray(back), np.arange(n_pad))
    # each dilated group takes every dil-th element
    np.testing.assert_array_equal(np.asarray(g[0]), np.arange(0, block, dil))
