import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.ops.window_ops import window_sort, stratified_window_attention
from pointcept_tpu.models import build_model


def brute_force_stratified(q, k, v, coord, batch, valid, is_down, window, quant,
                           scale, qt, kt, vt):
    """Exact pair semantics of reference BasicLayer:345-450 with nested big
    windows (= the TPU design): dense same-small-window pairs + stratified
    (same big window, different small window, key downsampled)."""
    n, h, d = q.shape
    cmin = coord[valid].min(axis=0)
    small = np.floor((coord - cmin) / window).astype(np.int64)
    big = small >> 1
    two_l = qt.shape[0]
    out = np.zeros((n, h, d), np.float32)
    for i in range(n):
        if not valid[i]:
            continue
        keys = []
        for j in range(n):
            if not valid[j] or batch[j] != batch[i]:
                continue
            same_small = (small[i] == small[j]).all()
            same_big = (big[i] == big[j]).all()
            if same_small or (same_big and is_down[j] and not same_small):
                keys.append(j)
        if not keys:
            continue
        rel = coord[i] - coord[keys]  # [m, 3]
        r = np.floor((rel + 2 * window - 1e-4) / quant).astype(np.int64)
        r = np.clip(r, 0, two_l - 1)
        for hh in range(h):
            logits = np.array([
                scale * q[i, hh] @ k[j, hh]
                + sum(q[i, hh] @ qt[r[m_, dd], hh, :, dd] for dd in range(3))
                + sum(k[j, hh] @ kt[r[m_, dd], hh, :, dd] for dd in range(3))
                for m_, j in enumerate(keys)
            ])
            e = np.exp(logits - logits.max())
            p = e / e.sum()
            acc = np.zeros(d, np.float32)
            for m_, j in enumerate(keys):
                acc += p[m_] * (v[j, hh] + sum(vt[r[m_, dd], hh, :, dd] for dd in range(3)))
            out[i, hh] = acc
    return out


def test_stratified_window_attention_matches_bruteforce():
    rng = np.random.RandomState(0)
    n, h, d = 128, 2, 8
    patch = 32
    window, quant = 0.4, 0.05
    # two scenes, points clustered so windows hold a handful of points each
    coord = (rng.rand(n, 3) * 1.2).astype(np.float32)
    batch = np.concatenate([np.zeros(56, np.int32), np.ones(56, np.int32), np.full(16, -1, np.int32)])
    valid = batch >= 0
    coord[~valid] = 0
    is_down = rng.rand(n) < 0.3
    is_down &= valid

    qkv = rng.randn(n, 3, h, d).astype(np.float32) * 0.5
    two_l = 2 * int((2 * window + 1e-4) // quant)
    qt = (rng.randn(two_l, h, d, 3) * 0.1).astype(np.float32)
    kt = (rng.randn(two_l, h, d, 3) * 0.1).astype(np.float32)
    vt = (rng.randn(two_l, h, d, 3) * 0.1).astype(np.float32)
    scale = d**-0.5

    wo = window_sort(jnp.asarray(coord), jnp.asarray(batch), jnp.asarray(valid), window, 0.0)
    order = np.asarray(wo.order)
    out_s = stratified_window_attention(
        jnp.asarray(qkv)[wo.order],
        jnp.asarray(coord)[wo.order],
        wo.k1,
        wo.k2,
        jnp.asarray(is_down)[wo.order],
        patch_size=patch,
        window_size=window,
        quant_size=quant,
        scale=scale,
        q_table=jnp.asarray(qt),
        k_table=jnp.asarray(kt),
        v_table=jnp.asarray(vt),
        down_capacity=64,
        slab_size=64,
    )
    inv = np.zeros(n, np.int32)
    inv[order] = np.arange(n)
    got = np.asarray(out_s)[inv]

    expect = brute_force_stratified(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], coord, batch, valid, is_down,
        window, quant, scale, qt, kt, vt,
    )
    np.testing.assert_allclose(got[valid], expect[valid], atol=2e-4)


def small_st_cfg(capacity=256):
    return dict(
        type="ST-v1m2",
        in_channels=6,
        num_classes=5,
        channels=(16, 16, 32, 32),
        num_heads=(2, 2, 4),
        depths=(2, 2, 2),
        window_size=(0.4, 0.8, 1.6),
        quant_size=(0.05, 0.1, 0.2),
        down_ratio=0.25,
        down_num_sample=8,
        kp_ball_radius=0.1,
        kp_max_neighbor=8,
        kp_grid_size=0.04,
        stem=True,
        patch_size=32,
        slab_size=32,
    )


def make_batch(capacity=256, seed=0):
    rng = np.random.RandomState(seed)
    n1, n2 = 100, 80
    coord = np.zeros((capacity, 3), np.float32)
    coord[: n1 + n2] = rng.rand(n1 + n2, 3) * 2
    feat = np.zeros((capacity, 6), np.float32)
    feat[: n1 + n2] = rng.randn(n1 + n2, 6)
    batch = np.full(capacity, -1, np.int32)
    batch[:n1] = 0
    batch[n1 : n1 + n2] = 1
    segment = np.full(capacity, -1, np.int32)
    segment[: n1 + n2] = rng.randint(0, 5, n1 + n2)
    return dict(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        batch=jnp.asarray(batch),
        segment=jnp.asarray(segment),
        num_scenes=2,
    )


def test_st_forward_and_grad():
    model = build_model(small_st_cfg())
    data = make_batch()
    params = model.init(jax.random.PRNGKey(0), data, train=False)
    out, _ = model.apply(params, data, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    assert out.shape == (256, 5)
    assert np.isfinite(np.asarray(out)[np.asarray(data["batch"]) >= 0]).all()

    def loss_fn(p):
        logits, _ = model.apply(p, data, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                                mutable=["batch_stats"])
        seg = data["segment"]
        m = seg >= 0
        lp = jax.nn.log_softmax(logits, -1)
        return -(jnp.where(m, jnp.take_along_axis(lp, jnp.maximum(seg, 0)[:, None], 1)[:, 0], 0).sum()
                 / jnp.maximum(m.sum(), 1))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l, dtype=np.float64)).all() for l in leaves)
    # attention rel tables receive gradient
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    tbl = [np.abs(np.asarray(v)).sum() for kpath, v in flat if "relative_pos_query_table" in str(kpath)]
    assert tbl and sum(tbl) > 0


def test_st_v1m1_adapter_forward():
    model = build_model(dict(
        type="ST-v1m1",
        in_channels=6,
        num_classes=5,
        depths=(1, 1, 1),
        channels=(16, 16, 32),
        num_heads=(2, 2, 4),
        window_size=(0.2, 0.4, 0.8),
        grid_sizes=(0.04, 0.08, 0.16),
        quant_sizes=(0.05, 0.1, 0.2),
        concat_xyz=True,
        k=8,
        kp_max_neighbor=8,
        prev_grid_size=0.05,
        stem_transformer=False,
        patch_size=32,
        slab_size=32,
    ))
    data = make_batch()
    params = model.init(jax.random.PRNGKey(0), data, train=False)
    out, _ = model.apply(params, data, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    logits = out.feat if hasattr(out, "feat") else out
    assert logits.shape == (256, 5)
    assert np.isfinite(np.asarray(logits)[np.asarray(data["batch"]) >= 0]).all()
