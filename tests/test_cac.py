import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def test_cac_train_and_eval():
    pb = make_batch([100, 60], capacity=192, num_classes=13)
    cfg = dict(
        type="CAC-v1m1",
        num_classes=13,
        backbone_out_channels=24,
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0, base_channels=8,
            channels=(8, 16, 32, 64, 64, 32, 24, 24), layers=(1,) * 8,
            serialize_depth=8, pool_capacity_factor=0.75,
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    )
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, pb, train=True, mutable=["batch_stats"]
        )
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    for k in ("loss", "seg_loss", "pre_loss", "pre_self_loss", "kl_loss"):
        assert np.isfinite(float(out[k])), k
    norms = [float(np.linalg.norm(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)

    ev = model.apply(variables, pb, train=False)
    assert ev["seg_logits"].shape == (192, 13)
    assert np.isfinite(float(ev["loss"]))


def test_dino_enhanced_segmentor():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pointcept_tpu.engines.train import make_point_batch
    from pointcept_tpu.models import build_model

    rng = np.random.RandomState(0)
    cap, n, md = 128, 90, 40
    coord = np.zeros((cap, 3), np.float32); coord[:n] = rng.rand(n, 3)
    batch = np.full(cap, -1, np.int32); batch[:n] = 0
    seg = np.full(cap, -1, np.int32); seg[:n] = rng.randint(0, 5, n)
    feat = np.zeros((cap, 6), np.float32); feat[:n] = rng.randn(n, 6)
    pb = make_point_batch(dict(coord=jnp.asarray(coord), feat=jnp.asarray(feat),
                               batch=jnp.asarray(batch), segment=jnp.asarray(seg)), 1)
    data = dict(
        point=pb,
        dino_coord=jnp.asarray(rng.rand(md, 3).astype(np.float32)),
        dino_feat=jnp.asarray(rng.randn(md, 16).astype(np.float32)),
        dino_batch=jnp.zeros((md,), jnp.int32),
    )
    model = build_model(dict(
        type="DINOEnhancedSegmentor", num_classes=5, backbone=None,
        criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
    ))
    params = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(params, data, train=False)
    assert out["seg_logits"].shape == (cap, 5)
    assert np.isfinite(float(out["loss"]))
