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
