import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch


def test_sgiformer_forward_and_loss():
    pb = make_batch([120, 80], capacity=256, num_classes=13)
    # give instances + superpoints
    rng = np.random.RandomState(0)
    inst = np.where(np.asarray(pb.segment) >= 2, np.asarray(pb.segment) % 5, -1)
    centroid = np.asarray(pb.coord).copy()
    superpoint = rng.randint(0, 40, 256).astype(np.int32)
    pb = pb.replace(
        instance=jnp.asarray(inst.astype(np.int32)),
        instance_centroid=jnp.asarray(centroid),
    )
    cfg = dict(
        type="SGIFormer-v1m1",
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0, base_channels=8,
            channels=(8, 16, 32, 64, 64, 32, 24, 24), layers=(1,) * 8,
            serialize_depth=8, pool_capacity_factor=0.75,
        ),
        decoder=dict(
            dec_num_layer=2, num_sample_query=8, num_learn_query=8,
            num_classes=11, in_channel=24, d_model=32, nhead=4, hidden_dim=64,
            alpha=0.4,
        ),
        criteria=dict(loss_weight=(0.5, 1.0, 1.0, 0.5), non_object_weight=0.1),
        semantic_num_classes=11,
        segment_ignore_index=(-1, 0, 1),
        sp_capacity=128,
        max_instances=32,
    )
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False, superpoint=jnp.asarray(superpoint)
    )
    out = model.apply(variables, pb, train=False, superpoint=jnp.asarray(superpoint))
    q = 2 * (8 + 8)
    assert out["pred_cls"].shape == (q, 12)
    assert out["pred_mask"].shape == (q, 128)
    assert np.isfinite(float(out["loss"]))

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pb, train=True, superpoint=jnp.asarray(superpoint), mutable=["batch_stats"],
        )
        return o["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    norms = [float(np.linalg.norm(np.asarray(g, np.float64))) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.6


def test_hungarian_match():
    from pointcept_tpu.models.sgiformer.sgiformer import hungarian_match

    cost = np.array([[1.0, 5.0, 9.0], [4.0, 2.0, 9.0], [9.0, 9.0, 9.0]])
    valid = np.array([True, True, False])
    assign = hungarian_match(cost, valid)
    assert assign[0] == 0 and assign[1] == 1
    assert (assign == -1).sum() == 1
