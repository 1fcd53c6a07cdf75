"""Point ops: kNN, ball query, FPS, grouping, interpolation — TPU-native.

Reference counterpart: the CUDA `libs/pointops` package (kNN query, ball query,
farthest point sampling, grouping, 3-NN interpolation; see
`libs/pointops/src/pointops_api.cpp:15-33`). The offset-delimited ragged batches
become masked fixed-capacity arrays; kNN is a tiled scan (each tile is one
[M, T] distance matmul on the MXU + running top-k merge) instead of per-query
neighborhood walks, which is the shape TPUs want.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e10


def knn_query(
    k: int,
    base_coord: jnp.ndarray,  # [N, 3]
    base_batch: jnp.ndarray,  # [N] (-1 padding)
    query_coord: Optional[jnp.ndarray] = None,  # [M, 3] (default: base)
    query_batch: Optional[jnp.ndarray] = None,
    tile: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest base points per query within the same scene.

    Returns (idx [M, k] int32, dist [M, k] f32 — actual distances, padded
    neighbors repeat the nearest found and dist=BIG when fewer than k exist).
    Parity: pointops.knn_query (`libs/pointops/functions/query.py:7`), which
    returns sqrt distances; here squared distances are avoided at the end too.
    """
    if query_coord is None:
        query_coord = base_coord
        query_batch = base_batch
    m = query_coord.shape[0]
    n = base_coord.shape[0]
    num_tiles = (n + tile - 1) // tile
    n_pad = num_tiles * tile
    bc = jnp.pad(base_coord, ((0, n_pad - n), (0, 0)))
    bb = jnp.pad(base_batch, (0, n_pad - n), constant_values=-2)

    q_sq = jnp.sum(query_coord**2, axis=1, keepdims=True)  # [M, 1]

    def body(carry, t):
        best_d, best_i = carry
        base_t = jax.lax.dynamic_slice(bc, (t * tile, 0), (tile, 3))
        batch_t = jax.lax.dynamic_slice(bb, (t * tile,), (tile,))
        b_sq = jnp.sum(base_t**2, axis=1)[None, :]  # [1, T]
        cross = jnp.dot(query_coord, base_t.T, preferred_element_type=jnp.float32)
        d = q_sq + b_sq - 2 * cross  # [M, T]
        same = query_batch[:, None] == batch_t[None, :]
        d = jnp.where(same & (batch_t[None, :] >= 0), d, BIG)
        ids = (t * tile + jnp.arange(tile, dtype=jnp.int32))[None, :].repeat(m, axis=0)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        nd, sel = jax.lax.top_k(-cat_d, k)
        return (-nd, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((m, k), BIG, jnp.float32), jnp.zeros((m, k), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(num_tiles))
    # replace not-found with the nearest found (reference pads similarly)
    found = best_d < BIG
    best_i = jnp.where(found, best_i, best_i[:, :1])
    # recompute exact distances for the selected neighbors: the |q|^2+|b|^2-2qb
    # MXU trick cancels catastrophically in f32 (self-distance ~1e-4, not 0),
    # which breaks inverse-distance interpolation weights downstream
    exact = jnp.sum(jnp.square(base_coord[best_i] - query_coord[:, None, :]), axis=-1)
    # floor before sqrt: d/dx sqrt(x) at x=0 is inf and poisons backward passes
    # even when downstream consumers have zero cotangent (inf * 0 = NaN)
    return best_i, jnp.sqrt(jnp.maximum(jnp.where(found, exact, BIG), 1e-12))


def ball_query(
    k: int,
    radius: float,
    base_coord: jnp.ndarray,
    base_batch: jnp.ndarray,
    query_coord: Optional[jnp.ndarray] = None,
    query_batch: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN restricted to a radius (reference pointops ball query semantics:
    neighbors beyond the radius are replaced by the nearest in-range point)."""
    idx, dist = knn_query(k, base_coord, base_batch, query_coord, query_batch)
    in_range = dist <= radius
    idx = jnp.where(in_range, idx, idx[:, :1])
    dist = jnp.where(in_range, dist, dist[:, :1])
    return idx, dist


def farthest_point_sampling(
    coord: jnp.ndarray,  # [N, 3]
    mask: jnp.ndarray,  # [N]
    num_samples: int,
) -> jnp.ndarray:
    """Iterative FPS over one scene (masked). Returns [num_samples] int32.

    Parity: pointops.farthest_point_sampling (`functions/sampling.py:7`); batched
    use vmaps over scenes. Sequential by nature: fori_loop of argmax updates.
    """
    n = coord.shape[0]
    start = jnp.argmax(mask)  # first valid point

    def body(i, state):
        dists, selected = state
        last = selected[i - 1]
        d = jnp.sum((coord - coord[last]) ** 2, axis=1)
        dists = jnp.minimum(dists, jnp.where(mask, d, -1.0))
        nxt = jnp.argmax(dists)
        selected = selected.at[i].set(nxt.astype(jnp.int32))
        return dists, selected

    dists0 = jnp.where(mask, BIG, -1.0)
    selected0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, selected = jax.lax.fori_loop(1, num_samples, body, (dists0, selected0))
    return selected


def grouping(
    feat: jnp.ndarray,  # [N, C]
    coord: jnp.ndarray,  # [N, 3]
    query_coord: jnp.ndarray,  # [M, 3]
    idx: jnp.ndarray,  # [M, k]
    with_coord: bool = True,
) -> jnp.ndarray:
    """Gather neighbor feats (+ relative coords) per query.

    Parity: pointops.grouping (`functions/grouping.py:7`): output
    [M, k, 3+C] = concat(nbr_coord - query_coord, nbr_feat)."""
    g_feat = feat[idx]  # [M, k, C]
    if not with_coord:
        return g_feat
    rel = coord[idx] - query_coord[:, None, :]
    return jnp.concatenate([rel, g_feat], axis=-1)


def interpolation(
    src_coord: jnp.ndarray,  # [N, 3]
    src_batch: jnp.ndarray,
    src_feat: jnp.ndarray,  # [N, C]
    dst_coord: jnp.ndarray,  # [M, 3]
    dst_batch: jnp.ndarray,
    k: int = 3,
) -> jnp.ndarray:
    """k-NN inverse-distance interpolation (pointops.interpolation,
    `functions/interpolation.py:8`)."""
    idx, dist = knn_query(k, src_coord, src_batch, dst_coord, dst_batch)
    inv = 1.0 / jnp.maximum(dist, 1e-8)
    w = inv / jnp.sum(inv, axis=1, keepdims=True)
    return jnp.sum(src_feat[idx] * w[..., None], axis=1)


# -------- host-side (numpy) FPS for dataset loading (ModelNet, reference
# `datasets/modelnet.py:100`) --------------------------------------------------
def fps_numpy(coord: np.ndarray, num_samples: int, seed: int = 0) -> np.ndarray:
    n = coord.shape[0]
    rng = np.random.RandomState(seed)
    selected = np.zeros(num_samples, np.int64)
    selected[0] = rng.randint(n)
    dists = np.full(n, np.inf)
    for i in range(1, num_samples):
        d = np.sum((coord - coord[selected[i - 1]]) ** 2, axis=1)
        dists = np.minimum(dists, d)
        selected[i] = np.argmax(dists)
    return selected


def fps_downsample(coord, batch, mask, num_scenes: int, out_capacity: int):
    """Batched FPS: each scene gets out_capacity // num_scenes slots.

    Returns (idx [M] int32 global point indices, new_batch [M] (-1 for slots
    beyond a scene's real sample count)). TPU equivalent of the reference's
    per-scene `n_o = count // stride` FPS (`point_transformer_seg.py:101`);
    here the per-scene sample count is the static slot count capped by the
    scene's valid points.
    """
    b = num_scenes
    per = out_capacity // b
    scene_masks = jnp.stack([mask & (batch == i) for i in range(b)])  # [B, N]
    idx = jax.vmap(lambda m: farthest_point_sampling(coord, m, per))(scene_masks)  # [B, per]
    counts = jnp.sum(scene_masks, axis=1)  # [B]
    slot = jnp.tile(jnp.arange(per, dtype=jnp.int32)[None], (b, 1))
    new_batch = jnp.where(
        (slot < jnp.maximum(counts, 1)[:, None]) & (counts[:, None] > 0),
        jnp.arange(b, dtype=jnp.int32)[:, None],
        -1,
    )
    return idx.reshape(-1), new_batch.reshape(-1)
