import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def test_ptv1_seg_forward_and_grad():
    pb = make_batch([100, 60], capacity=192, num_classes=13)
    model = build_model(dict(type="PointTransformer-Seg26", in_channels=6, num_classes=13))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    out = model.apply(variables, pb, train=False)
    assert out.feat.shape == (192, 13)
    assert np.isfinite(np.asarray(out.feat)[np.asarray(pb.mask)]).all()

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pb, train=True, mutable=["batch_stats"],
        )
        logits = o.feat
        valid = pb.segment >= 0
        lp = jax.nn.log_softmax(logits)
        return -jnp.sum(jnp.where(valid, jnp.take_along_axis(lp, jnp.maximum(pb.segment, 0)[:, None], 1)[:, 0], 0)) / jnp.sum(valid)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    norms = [float(np.linalg.norm(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_ptv1_cls_forward():
    pb = make_batch([128, 128], capacity=256, num_classes=13)
    model = build_model(dict(type="PointTransformer-Cls26", in_channels=6, num_classes=40))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    logits = model.apply(variables, pb, train=False)
    assert logits.shape == (2, 40)
    assert np.isfinite(np.asarray(logits)).all()


def test_variant_overrides_apply():
    # regression: type()-built variants must actually override flax defaults
    from pointcept_tpu.models import build_model

    assert build_model(dict(type="PointTransformer-Seg26", in_channels=6, num_classes=5)).blocks == (1, 1, 1, 1, 1)
    assert build_model(dict(type="MinkUNet14A", in_channels=6, num_classes=5)).layers == (1, 1, 1, 1, 1, 1, 1, 1)
    m = build_model(dict(type="PointTransformer-PartSeg26", in_channels=6, num_classes=50))
    assert m.num_shape_classes == 16


def test_partseg_category_conditioning():
    import jax
    import jax.numpy as jnp
    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model

    rng = np.random.RandomState(0)
    cap, n = 128, 100
    coord = np.zeros((cap, 3), np.float32); coord[:n] = rng.rand(n, 3)
    feat = np.zeros((cap, 6), np.float32); feat[:n] = rng.randn(n, 6)
    batch = np.full(cap, -1, np.int32); batch[:n] = 0
    pb = make_point_batch(dict(coord=jnp.asarray(coord), feat=jnp.asarray(feat),
                               batch=jnp.asarray(batch)), 1)
    model = build_model(dict(type="PointTransformer-PartSeg26", in_channels=6, num_classes=50))
    cat = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), pb, train=False, category=cat)
    out = model.apply(params, pb, train=False, category=cat)
    logits = out.feat if hasattr(out, "feat") else out
    assert logits.shape == (cap, 50)
    out2 = model.apply(params, pb, train=False, category=jnp.full((1,), 7, jnp.int32))
    l2 = out2.feat if hasattr(out2, "feat") else out2
    assert not np.allclose(np.asarray(logits), np.asarray(l2))  # category changes output
