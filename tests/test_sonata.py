import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.datasets import Compose
from pointcept_tpu.datasets.synthetic import synthesize_scene
from pointcept_tpu.datasets.utils import point_collate_fn
from pointcept_tpu.engines.train import make_view_inputs
from pointcept_tpu.models import build_model


def sonata_batch(capacity=768, local_capacity=512):
    pipeline = Compose(
        [
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="Copy", keys_dict={"coord": "origin_coord"}),
            dict(type="NormalizeColor"),
            dict(
                type="MultiViewGenerator",
                global_view_num=2,
                global_view_scale=(0.6, 1.0),
                local_view_num=4,
                local_view_scale=(0.2, 0.4),
                global_transform=[dict(type="RandomScale", scale=[0.9, 1.1])],
                local_transform=[dict(type="RandomScale", scale=[0.9, 1.1])],
                view_keys=("coord", "origin_coord", "color", "normal"),
            ),
            dict(
                type="Collect",
                keys=("global_coord", "global_origin_coord", "local_coord", "local_origin_coord"),
                offset_keys_dict=dict(global_offset="global_coord", local_offset="local_coord"),
                global_feat_keys=("global_color", "global_normal"),
                local_feat_keys=("local_color", "local_normal"),
            ),
        ]
    )
    samples = []
    for i in range(2):
        d = synthesize_scene(i, num_points=500, num_classes=5)
        d["index_valid_keys"] = ["coord", "color", "normal", "origin_coord", "segment", "instance"]
        samples.append(pipeline(d))
    return point_collate_fn(samples, capacity=capacity)


def small_enc_backbone():
    return dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 32),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(32, 32, 32),
        mlp_ratio=2,
        drop_path=0.0,
        enc_mode=True,
        shuffle_orders=False,
        serialize_depth=8,
        pool_capacity_factors=(0.75, 0.75),
    )


def test_multiview_generator_shapes():
    batch = sonata_batch()
    assert batch["global_coord"].shape[0] == 768
    assert batch["local_coord"].shape[0] == 768
    gb = batch["global_batch"]
    lb = batch["local_batch"]
    # 2 scenes x 2 global views = ids 0..3; x4 local = 0..7
    assert set(np.unique(gb[gb >= 0])) <= set(range(4))
    assert set(np.unique(lb[lb >= 0])) <= set(range(8))
    assert batch["global_feat"].shape[1] == 6


def test_sonata_init_and_train_step():
    batch = sonata_batch()
    ns = batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    inputs = make_view_inputs(arrays, ns)

    cfg = dict(
        type="Sonata-v1m1",
        backbone=small_enc_backbone(),
        head_in_channels=8 + 16 + 32,
        head_hidden_channels=32,
        head_embed_channels=16,
        head_num_prototypes=24,
        num_global_view=2,
        num_local_view=4,
        match_max_r=0.3,
        up_cast_level=2,
    )
    model = build_model(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)}
    variables = model.init(rngs, inputs, train=False)
    params, bs = variables["params"], variables.get("batch_stats", {})
    # teacher initialized from student (as the trainer does)
    params = dict(params)
    for tk, sk in model.ema_pairs.items():
        params[tk] = params[sk]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs},
            inputs,
            train=True,
            hyper={"mask_size": jnp.asarray(0.3), "mask_ratio": jnp.asarray(0.5), "teacher_temp": jnp.asarray(0.05)},
            rngs={"mask": jax.random.PRNGKey(3), "shuffle": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ("mask_loss", "roll_mask_loss", "unmask_loss"):
        assert k in out and np.isfinite(float(out[k])), k
    # teacher params receive no gradient (they're inputs, not params)
    norms = {".".join(map(str, path)): float(jnp.linalg.norm(g)) for path, g in
             jax.tree_util.tree_leaves_with_path(grads)}
    assert all(np.isfinite(v) for v in norms.values())
    assert sum(v > 0 for v in norms.values()) > 0


def test_sinkhorn_assignment_properties():
    from pointcept_tpu.models.sonata import sinkhorn_knopp

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    valid = jnp.asarray(np.concatenate([np.ones(48), np.zeros(16)]).astype(bool))
    q = np.asarray(sinkhorn_knopp(feat, 0.05, valid))
    # each valid sample's assignment sums to ~1; invalid rows to ~0
    np.testing.assert_allclose(q[:48].sum(1), 1.0, atol=1e-3)
    np.testing.assert_allclose(q[48:].sum(1), 0.0, atol=1e-5)
    # prototypes get balanced mass: each column total ~ n_valid/K
    col = q[:48].sum(0)
    assert col.max() / max(col.min(), 1e-9) < 20


def test_sonata_with_ptv3m2_mask_token():
    batch = sonata_batch()
    ns = batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    from pointcept_tpu.engines.train import make_view_inputs
    data = make_view_inputs(arrays, ns)
    bb = small_enc_backbone()
    bb["type"] = "PT-v3m2"
    bb["mask_token"] = True
    model = build_model(dict(
        type="Sonata-v1m1", backbone=bb,
        head_in_channels=56, head_hidden_channels=32, head_embed_channels=16,
        head_num_prototypes=8, num_global_view=2, num_local_view=4, up_cast_level=2,
    ))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "shuffle": jax.random.PRNGKey(3)}
    params = model.init(rngs, data, train=False)
    names = [str(kp) for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    assert any("mask_token" in n for n in names)
    out, _ = model.apply(params, data, train=True, mutable=["batch_stats"],
                         rngs={"mask": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
                               "shuffle": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out["loss"]))
