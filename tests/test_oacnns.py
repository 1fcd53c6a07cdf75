import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def test_oacnns_forward_and_grad():
    pb = make_batch([100, 60], capacity=192, num_classes=13)
    cfg = dict(
        type="OACNNs",
        in_channels=6,
        num_classes=13,
        embed_channels=8,
        enc_channels=(8, 16),
        groups=(2, 4),
        enc_depth=(1, 1),
        down_ratio=(2, 2),
        dec_channels=(8, 16),
        point_grid_size=((4, 8), (2, 4)),
        dec_depth=(1, 1),
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
            {"params": params, "batch_stats": variables["batch_stats"]}, pb, train=True, mutable=["batch_stats"]
        )
        logits = o.feat
        valid = pb.segment >= 0
        lp = jax.nn.log_softmax(logits)
        return -jnp.sum(jnp.where(valid, jnp.take_along_axis(lp, jnp.maximum(pb.segment, 0)[:, None], 1)[:, 0], 0)) / jnp.sum(valid)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    norms = [float(np.linalg.norm(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.85
