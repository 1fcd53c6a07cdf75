import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from pointcept_tpu.ops.pointrope import point_rope
from tests.test_structure import make_batch


def test_point_rope_properties():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 16, 12).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 16, 12).astype(np.float32))
    pos = jnp.asarray(rng.randint(0, 32, size=(2, 16, 3)).astype(np.int32))
    rq = point_rope(q, pos)
    # norms preserved (rotation)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rq), axis=-1), np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-4
    )
    # relative property: dot(rope(q,p), rope(k,p)) depends only on p_q - p_k
    pos_a = jnp.asarray(np.tile([[1, 2, 3]], (1, 1, 1)).reshape(1, 1, 3))
    pos_b = jnp.asarray(np.tile([[4, 6, 8]], (1, 1, 1)).reshape(1, 1, 3))
    shift = jnp.asarray([[[10, 20, 30]]])
    q1 = q[:1, :1, :1]
    k1 = k[:1, :1, :1]
    d1 = float(jnp.sum(point_rope(q1, pos_a) * point_rope(k1, pos_b)))
    d2 = float(jnp.sum(point_rope(q1, pos_a + shift) * point_rope(k1, pos_b + shift)))
    assert abs(d1 - d2) < 1e-3


def test_litept_forward_and_grad():
    pb = make_batch([100, 60], capacity=192, num_classes=13)
    cfg = dict(
        type="LitePT-v1",
        in_channels=6,
        order=("z", "z-trans"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(12, 24, 48),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(32, 32, 32),
        enc_conv=(True, True, False),
        enc_attn=(False, False, True),
        enc_rope_freq=(100.0, 100.0, 100.0),
        dec_depths=(1, 1),
        dec_channels=(12, 24),
        dec_num_head=(2, 4),
        dec_patch_size=(32, 32),
        dec_conv=(True, True),
        dec_attn=(False, False),
        dec_rope_freq=(100.0, 100.0),
        mlp_ratio=2,
        drop_path=0.0,
        shuffle_orders=False,
        serialize_depth=8,
        pool_capacity_factors=(0.75, 0.75),
    )
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    out = model.apply(variables, pb, train=False)
    assert out.feat.shape == (192, 12)
    assert np.isfinite(np.asarray(out.feat)[np.asarray(pb.mask)]).all()

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, pb, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(jnp.square(o.feat) * pb.mask[:, None])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    norms = [float(np.linalg.norm(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
