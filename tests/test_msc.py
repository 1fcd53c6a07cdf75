import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.datasets import Compose
from pointcept_tpu.datasets.synthetic import synthesize_scene
from pointcept_tpu.datasets.utils import point_collate_fn
from pointcept_tpu.engines.train import make_view_inputs
from pointcept_tpu.models import build_model


def msc_batch(capacity=512):
    pipeline = Compose(
        [
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="Copy", keys_dict={"coord": "origin_coord"}),
            dict(type="NormalizeColor"),
            dict(
                type="ContrastiveViewsGenerator",
                view_keys=("coord", "color", "normal", "origin_coord"),
                view_trans_cfg=[
                    dict(type="RandomRotate", angle=[-1, 1], axis="z", p=1.0),
                    dict(type="RandomScale", scale=[0.9, 1.1]),
                    dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True,
                         keys=("coord", "color", "normal", "origin_coord")),
                ],
            ),
            dict(
                type="Collect",
                keys=(
                    "view1_coord", "view1_grid_coord", "view1_origin_coord",
                    "view2_coord", "view2_grid_coord", "view2_origin_coord",
                    "view1_color", "view1_normal", "view2_color", "view2_normal",
                ),
                offset_keys_dict=dict(view1_offset="view1_coord", view2_offset="view2_coord"),
                view1_feat_keys=("view1_color", "view1_normal"),
                view2_feat_keys=("view2_color", "view2_normal"),
            ),
        ]
    )
    samples = []
    for i in range(2):
        d = synthesize_scene(i, num_points=600, num_classes=5)
        d["index_valid_keys"] = ["coord", "color", "normal", "origin_coord", "segment", "instance"]
        samples.append(pipeline(d))
    return point_collate_fn(samples, capacity=capacity)


def test_views_generator_and_collate():
    batch = msc_batch()
    assert batch["view1_coord"].shape == (512, 3)
    assert batch["view2_feat"].shape == (512, 6)
    assert (batch["view1_batch"] >= 0).sum() > 0
    # each view's aug differs but origin coords agree where valid
    v1 = batch["view1_origin_coord"][batch["view1_batch"] >= 0]
    assert np.isfinite(v1).all()


def test_msc_forward_and_grad():
    batch = msc_batch()
    ns = batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    inputs = make_view_inputs(arrays, ns)
    cfg = dict(
        type="MSC-v1m1",
        backbone=dict(
            type="SpUNet-v1m1",
            in_channels=6,
            num_classes=0,
            base_channels=8,
            channels=(8, 16, 32, 64, 64, 32, 24, 24),
            layers=(1, 1, 1, 1, 1, 1, 1, 1),
            serialize_depth=8,
            pool_capacity_factor=0.75,
        ),
        backbone_in_channels=6,
        backbone_out_channels=24,
        mask_grid_size=0.2,
        mask_rate=0.4,
        matching_max_k=4,
        matching_max_radius=0.1,
        matching_max_pair=128,
    )
    model = build_model(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = model.init(rngs, inputs, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs,
            train=True,
            rngs={"mask": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(out["nce_loss"]))
    assert np.isfinite(float(out["color_loss"]))
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_msc_v1m2_csc_forward_and_grad():
    batch = msc_batch()
    model = build_model(dict(
        type="MSC-v1m2",
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0,
            channels=(8, 8, 8, 8, 8, 8, 8, 8), layers=(1, 1, 1, 1, 1, 1, 1, 1),
            serialize_depth=8,
        ),
        backbone_in_channels=6,
        backbone_out_channels=8,
        matching_max_pair=128,
        r1=0.1,
        r2=0.5,
        reconstruct_color=True,
        reconstruct_normal=False,
    ))
    ns = batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    data = make_view_inputs(arrays, ns)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, data, train=False
    )

    def loss_fn(p):
        out, _ = model.apply(
            p, data, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        return out["loss"], out

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(out["nce_loss"]) >= 0
    assert all(np.isfinite(np.asarray(l, np.float64)).all() for l in jax.tree_util.tree_leaves(g))
