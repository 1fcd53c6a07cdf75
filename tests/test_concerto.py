import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from tests.test_sonata import sonata_batch, small_enc_backbone


def test_concerto_enc2d_loss():
    from pointcept_tpu.engines.train import make_view_inputs

    batch = sonata_batch()
    ns = batch.pop("num_scenes")
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    data = make_view_inputs(arrays, ns)
    rng = np.random.RandomState(0)
    ph = pw = 4
    max_imgs = 1
    ng = data["global"].capacity
    # random correspondences for principal-view points; half invalid
    corr = rng.randint(0, 4, size=(ng, max_imgs, 2)).astype(np.int32)
    corr[rng.rand(ng, max_imgs) < 0.5] = -1
    data["global_correspondence"] = jnp.asarray(corr)
    n_scenes = ns  # scenes before view expansion
    data["feature2d"] = jnp.asarray(rng.randn(n_scenes * max_imgs, ph * pw, 12).astype(np.float32))

    model = build_model(dict(
        type="Concerto-v1m1",
        backbone=small_enc_backbone(),
        head_in_channels=56,
        head_hidden_channels=32,
        head_embed_channels=16,
        head_num_prototypes=8,
        num_global_view=2,
        num_local_view=4,
        up_cast_level=2,
        patch_h=ph,
        patch_w=pw,
        max_images=max_imgs,
        enc2d_in_channels=12,
        enc2d_loss_weight=0.2,
        full_cast_channels=0,
    ))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "shuffle": jax.random.PRNGKey(3)}
    params = model.init(rngs, data, train=False)

    def loss_fn(p):
        out, _ = model.apply(
            p, data, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
                  "shuffle": jax.random.PRNGKey(3)},
        )
        return out["loss"], out

    (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert "enc2d_loss" in out and np.isfinite(float(out["enc2d_loss"]))
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    pp = [np.abs(np.asarray(v)).sum() for kp, v in flat if "patch_proj" in str(kp)]
    assert pp and sum(pp) > 0
