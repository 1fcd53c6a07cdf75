import numpy as np
import jax.numpy as jnp

from pointcept_tpu.ops.pointops import (
    ball_query,
    farthest_point_sampling,
    grouping,
    interpolation,
    knn_query,
)


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    n = 300
    coord = rng.rand(n, 3).astype(np.float32)
    batch = np.concatenate([np.zeros(150), np.ones(100), np.full(50, -1)]).astype(np.int32)
    idx, dist = knn_query(8, jnp.asarray(coord), jnp.asarray(batch), tile=64)
    idx = np.asarray(idx)
    dist = np.asarray(dist)
    for q in [0, 10, 149, 150, 200, 249]:
        d = np.linalg.norm(coord - coord[q], axis=1)
        d[batch != batch[q]] = np.inf
        expect = np.argsort(d)[:8]
        np.testing.assert_array_equal(np.sort(idx[q]), np.sort(expect))
        np.testing.assert_allclose(np.sort(dist[q]), np.sort(d[expect]), atol=1e-4)


def test_knn_cross_set():
    rng = np.random.RandomState(1)
    base = rng.rand(100, 3).astype(np.float32)
    query = rng.rand(20, 3).astype(np.float32)
    b0 = np.zeros(100, np.int32)
    q0 = np.zeros(20, np.int32)
    idx, dist = knn_query(4, jnp.asarray(base), jnp.asarray(b0), jnp.asarray(query), jnp.asarray(q0), tile=32)
    idx = np.asarray(idx)
    for q in range(20):
        d = np.linalg.norm(base - query[q], axis=1)
        np.testing.assert_array_equal(np.sort(idx[q]), np.sort(np.argsort(d)[:4]))


def test_fps_spread():
    rng = np.random.RandomState(2)
    coord = rng.rand(500, 3).astype(np.float32)
    mask = np.ones(500, bool)
    mask[400:] = False
    sel = np.asarray(farthest_point_sampling(jnp.asarray(coord), jnp.asarray(mask), 32))
    assert len(np.unique(sel)) == 32
    assert (sel < 400).all()  # only valid points
    # FPS samples should be more spread than random
    def min_pairwise(pts):
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    fps_spread = min_pairwise(coord[sel])
    rand_spread = np.mean([min_pairwise(coord[rng.choice(400, 32, replace=False)]) for _ in range(5)])
    assert fps_spread > rand_spread


def test_grouping_and_interpolation():
    rng = np.random.RandomState(3)
    n = 100
    coord = rng.rand(n, 3).astype(np.float32)
    feat = rng.rand(n, 5).astype(np.float32)
    batch = np.zeros(n, np.int32)
    idx, _ = knn_query(4, jnp.asarray(coord), jnp.asarray(batch), tile=32)
    g = np.asarray(grouping(jnp.asarray(feat), jnp.asarray(coord), jnp.asarray(coord), idx))
    assert g.shape == (n, 4, 8)
    # first neighbor of each point is itself -> rel coord 0, feat = own
    np.testing.assert_allclose(g[:, 0, :3], 0, atol=1e-5)
    np.testing.assert_allclose(g[:, 0, 3:], feat, atol=1e-6)

    # interpolation at src positions reproduces src feat (weight ~ 1 on self)
    out = np.asarray(
        interpolation(jnp.asarray(coord), jnp.asarray(batch), jnp.asarray(feat), jnp.asarray(coord), jnp.asarray(batch))
    )
    np.testing.assert_allclose(out, feat, atol=1e-3)


def test_ball_query_radius():
    rng = np.random.RandomState(4)
    coord = rng.rand(200, 3).astype(np.float32)
    batch = np.zeros(200, np.int32)
    idx, dist = ball_query(8, 0.1, jnp.asarray(coord), jnp.asarray(batch))
    dist = np.asarray(dist)
    assert (dist[np.isfinite(dist)] <= max(0.1, float(dist[:, 0].max())) + 1e-5).all()
