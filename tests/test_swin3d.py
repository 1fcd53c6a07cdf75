import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.engines.train import make_point_batch
from pointcept_tpu.models import build_model


def make_batch(capacity=256, seed=0):
    rng = np.random.RandomState(seed)
    n1, n2 = 100, 80
    n = n1 + n2
    coord = np.zeros((capacity, 3), np.float32)
    coord[:n] = rng.rand(n, 3) * 2
    grid = np.zeros((capacity, 3), np.int32)
    grid[:n] = (coord[:n] / 0.05).astype(np.int32)
    feat = np.zeros((capacity, 9), np.float32)
    feat[:n] = np.concatenate([rng.rand(n, 3), rng.randn(n, 3), rng.randn(n, 3)], axis=1)
    batch = np.full(capacity, -1, np.int32)
    batch[:n1] = 0
    batch[n1:n] = 1
    segment = np.full(capacity, -1, np.int32)
    segment[:n] = rng.randint(0, 5, n)
    arrays = dict(coord=jnp.asarray(coord), grid_coord=jnp.asarray(grid), feat=jnp.asarray(feat),
                  batch=jnp.asarray(batch), segment=jnp.asarray(segment))
    return make_point_batch(arrays, 2)


def swin_cfg():
    return dict(
        type="Swin3D-v1m1",
        in_channels=9,
        num_classes=5,
        base_grid_size=0.05,
        depths=(1, 2, 1),
        channels=(16, 32, 32),
        num_heads=(2, 4, 4),
        window_sizes=(5, 7, 7),
        quant_size=2,
        cRSE="XYZ_RGB_NORM",
        serialize_depth=8,
        patch_size=32,
        level_capacity_factor=0.6,
    )


def test_swin3d_forward_and_grad():
    model = build_model(swin_cfg())
    pb = make_batch()
    params = model.init(jax.random.PRNGKey(0), pb, train=False)
    out, _ = model.apply(params, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    assert out.feat.shape == (256, 5)
    valid = np.asarray(pb.batch) >= 0
    assert np.isfinite(np.asarray(out.feat)[valid]).all()

    def loss_fn(p):
        o, _ = model.apply(p, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
        seg = pb.segment
        m = seg >= 0
        lp = jax.nn.log_softmax(o.feat, -1)
        return -(jnp.where(m, jnp.take_along_axis(lp, jnp.maximum(seg, 0)[:, None], 1)[:, 0], 0).sum()
                 / jnp.maximum(m.sum(), 1))

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(l, np.float64)).all() for l in jax.tree_util.tree_leaves(g))
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for nm in ("query_xyz_table", "query_rgb_table", "query_norm_table"):
        t = [np.abs(np.asarray(v)).sum() for kp, v in flat if nm in str(kp)]
        assert t and sum(t) > 0, nm


def test_swin3d_linear_attn_upsample():
    """upsample="linear_attn" adds a depth-1 cRSE Swin block per Upsample
    (reference swin3d_layers.py Upsample :349-382) that participates in the
    graph: its params exist and receive gradient."""
    cfg = swin_cfg()
    cfg["upsample"] = "linear_attn"
    model = build_model(cfg)
    pb = make_batch()
    params = model.init(jax.random.PRNGKey(0), pb, train=False)
    names = [
        "/".join(str(k.key) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    assert any("up0/block" in n and "qkv" in n for n in names)
    out, _ = model.apply(
        params, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out.feat)[np.asarray(pb.batch) >= 0]).all()

    def loss_fn(p):
        o, _ = model.apply(p, pb, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
        return jnp.sum(jnp.where((pb.batch >= 0)[:, None], o.feat, 0.0) ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    t = [np.abs(np.asarray(v)).sum() for kp, v in flat
         if "up0" in str(kp) and "block" in str(kp)]
    assert t and sum(t) > 0


def test_crse_attention_matches_bruteforce():
    from pointcept_tpu.ops.window_ops import crse_window_attention, window_sort

    rng = np.random.RandomState(1)
    n, h, d = 64, 2, 4
    window, quant = 4, 2
    grid = np.zeros((n, 3), np.float32)
    valid = np.zeros(n, bool); valid[:50] = True
    grid[:50] = rng.randint(0, 12, (50, 3))
    batch = np.where(valid, 0, -1).astype(np.int32)
    sig = np.concatenate([grid / 1.0, rng.rand(n, 3) * 2 - 1], axis=1).astype(np.float32)
    qkv = (rng.randn(n, 3, h, d) * 0.5).astype(np.float32)
    two_l = 2 * window * quant
    qt = (rng.randn(3, two_l, h, d) * 0.1).astype(np.float32)
    kt = (rng.randn(3, two_l, h, d) * 0.1).astype(np.float32)
    vt = (rng.randn(3, two_l, h, d) * 0.1).astype(np.float32)
    tables = [dict(q=jnp.asarray(qt), k=jnp.asarray(kt), v=jnp.asarray(vt),
                   sl=0, qscale=float(quant), two_l=two_l)]
    scale = d**-0.5

    wo = window_sort(jnp.asarray(grid), jnp.asarray(batch), jnp.asarray(valid), float(window), 0.0)
    out = crse_window_attention(
        jnp.asarray(qkv)[wo.order], jnp.asarray(sig)[wo.order], wo.k1, wo.k2,
        patch_size=16, scale=scale, tables=tables,
    )
    got = np.asarray(out)[np.asarray(wo.inv)]

    win = np.floor(grid / window).astype(np.int64)
    expect = np.zeros((n, h, d), np.float32)
    for i in range(n):
        if not valid[i]:
            continue
        js = [j for j in range(n) if valid[j] and (win[j] == win[i]).all()]
        rel = sig[i, :3][None] - sig[js][:, :3]
        idx = np.clip(np.floor(rel * quant).astype(np.int64) + two_l // 2, 0, two_l - 1)
        for hh in range(h):
            logits = np.array([
                scale * qkv[i, 0, hh] @ qkv[j, 1, hh]
                + sum(qkv[i, 0, hh] @ qt[dd, idx[m_, dd], hh] for dd in range(3))
                + sum(qkv[j, 1, hh] @ kt[dd, idx[m_, dd], hh] for dd in range(3))
                for m_, j in enumerate(js)
            ])
            e = np.exp(logits - logits.max()); pr = e / e.sum()
            acc = np.zeros(d, np.float32)
            for m_, j in enumerate(js):
                acc += pr[m_] * (qkv[j, 2, hh] + sum(vt[dd, idx[m_, dd], hh] for dd in range(3)))
            expect[i, hh] = acc
    np.testing.assert_allclose(got[valid], expect[valid], atol=2e-4)
