import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def test_spvcnn_forward_and_grad():
    pb = make_batch([100, 60], capacity=192, num_classes=13)
    cfg = dict(
        type="SPVCNN",
        in_channels=6,
        out_channels=13,
        base_channels=8,
        channels=(8, 16, 32, 64, 64, 32, 24, 24),
        layers=(1,) * 8,
        serialize_depth=8,
        pool_capacity_factor=0.75,
    )
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    out = model.apply(variables, pb, train=False)
    assert out.feat.shape == (192, 13)
    assert np.isfinite(np.asarray(out.feat)[np.asarray(pb.mask)]).all()

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pb, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
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
