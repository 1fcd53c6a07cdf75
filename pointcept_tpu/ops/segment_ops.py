"""Segment reductions (TPU equivalents of torch_scatter's segment_csr/scatter_*).

The reference leans on `torch_scatter.segment_csr` (e.g. PTv3 pooling,
`point_transformer_v3m1_base.py:416`; classifier mean-pool, `models/default.py:332`).
Here segments are identified by per-element segment ids with a **static**
``num_segments`` (XLA requirement); jax.ops.segment_* lowers to efficient sorted
scatters on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scene_compaction(head: jnp.ndarray, cnt: jnp.ndarray, num_scenes: int,
                     scene_capacity_in: int, scene_out: int):
    """Head compaction for scene-blocked per-scene ranks (gapped slot ids).

    `head` [n] marks run heads in a scene-blocked sorted layout (scene s =
    rows [s*scene_capacity_in, ...)); `cnt` is its inclusive cumsum. Slot
    i = s*scene_out + r of the output holds scene s's r-th head. Because
    per-scene ids have gaps, a plain (id, pos) sort would misalign slot i with
    sorted position i — instead heads are compacted DENSELY and re-indexed via
    per-scene head-count prefixes (one sort + small gathers, no scatters).

    Returns (slot_valid [S*scene_out] bool, head_pos [S*scene_out] int32 —
    sorted-row index of each slot's head; 0 where invalid).
    """
    import numpy as np

    n = head.shape[0]
    S, cs_in, ms = num_scenes, scene_capacity_in, scene_out
    pos = jnp.arange(n, dtype=jnp.int32)
    hr = jnp.where(head, cnt - 1, n)  # dense global rank
    _, hpos = jax.lax.sort((hr, pos), num_keys=1, is_stable=False)
    bnd = np.arange(S + 1) * cs_in
    heads_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cnt[np.minimum(bnd[1:] - 1, n - 1)]]
    )  # [S+1]
    heads_in = heads_before[1:] - heads_before[:-1]
    slot = jnp.arange(S * ms, dtype=jnp.int32)
    s_of = slot // ms
    r = slot % ms
    valid = r < jnp.minimum(heads_in[s_of], ms)
    dense_idx = jnp.clip(heads_before[s_of] + r, 0, n - 1)
    head_pos = jnp.where(valid, jnp.take(hpos, dense_idx, axis=0), 0)
    return valid, head_pos


def segment_reduce(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, reduce: str = "sum",
                   indices_are_sorted: bool = False):
    """Reduce rows of `data` by segment id. ids >= num_segments are dropped.

    reduce in {sum, mean, max, min}. Rows for empty segments are 0 (sum/mean)
    or 0 (max/min — clamped from the identity, matching segment_csr's behavior
    of never producing inf for present segments; callers mask empty segments).
    Pass `indices_are_sorted=True` when ids are non-decreasing (run-ordered
    layouts) — XLA lowers sorted segment reductions without serialized scatters.
    """
    # route out-of-range ids to a garbage bucket
    oob = segment_ids >= num_segments
    ids = jnp.where(oob, num_segments, segment_ids)
    n = num_segments + 1
    srt = indices_are_sorted
    if reduce == "sum":
        out = jax.ops.segment_sum(data, ids, num_segments=n, indices_are_sorted=srt)
    elif reduce == "mean":
        s = jax.ops.segment_sum(data, ids, num_segments=n, indices_are_sorted=srt)
        c = jax.ops.segment_sum(
            jnp.ones((data.shape[0],) + (1,) * (data.ndim - 1), data.dtype), ids,
            num_segments=n, indices_are_sorted=srt,
        )
        out = s / jnp.maximum(c, 1)
    elif reduce == "max":
        out = jax.ops.segment_max(data, ids, num_segments=n, indices_are_sorted=srt)
        out = jnp.where(jnp.isfinite(out), out, 0)
    elif reduce == "min":
        out = jax.ops.segment_min(data, ids, num_segments=n, indices_are_sorted=srt)
        out = jnp.where(jnp.isfinite(out), out, 0)
    else:
        raise ValueError(f"unknown reduce {reduce}")
    return out[:num_segments]


def masked_segment_reduce(data, segment_ids, mask, num_segments: int, reduce: str = "sum"):
    """segment_reduce ignoring rows where mask is False."""
    ids = jnp.where(mask, segment_ids, num_segments)
    return segment_reduce(data, ids, num_segments, reduce=reduce)
