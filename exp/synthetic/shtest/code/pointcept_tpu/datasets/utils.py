"""Collation: ragged scene dicts -> fixed-capacity PointBatch arrays (numpy).

Reference counterpart: `pointcept/datasets/utils.py:19` (`collate_fn` — ragged
concat with cumulative offsets) and `:208` (`point_collate_fn` — Mix3D scene
fusion). TPU change: the concatenated batch is padded to a **static capacity**
(one jit compilation), padding marked with batch id -1 / label -1; the ragged
``offset`` vector becomes per-point batch ids.
"""

from __future__ import annotations

import random
from collections.abc import Mapping, Sequence
from typing import Dict, List, Optional

import numpy as np


def offset2batch_np(offset: np.ndarray) -> np.ndarray:
    counts = np.diff(np.concatenate([[0], offset]))
    return np.repeat(np.arange(len(offset)), counts)


def collate_fn(batch: List[dict]) -> dict:
    """Ragged concat along the point dim; per-sample `offset` becomes cumulative.

    (Parity with reference `datasets/utils.py:19` for dict samples.)
    """
    assert isinstance(batch[0], Mapping)
    out = {}
    keys = batch[0].keys()
    for key in keys:
        vals = [b[key] for b in batch]
        if key == "offset" or key.endswith("_offset"):
            acc, cum = [], 0
            for v in vals:
                acc.append(np.asarray(v) + cum)
                cum += int(np.asarray(v)[-1])
            out[key] = np.concatenate(acc)
        elif isinstance(vals[0], np.ndarray) and vals[0].ndim >= 1:
            out[key] = np.concatenate(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        elif isinstance(vals[0], str):
            out[key] = vals[0]
        else:
            out[key] = vals
    return out


def mix3d(batch: dict) -> dict:
    """Mix3D scene fusion: merge scene pairs by dropping every other offset
    (reference `point_collate_fn`, `datasets/utils.py:234-239`)."""
    offset = batch["offset"]
    if "instance" in batch:
        start = 0
        num_instance = 0
        inst = batch["instance"]
        for i in range(len(offset)):
            if i % 2 == 0:
                num_instance = max(inst[start : offset[i]].max(initial=0) + 1, 0)
            else:
                seg = inst[start : offset[i]]
                batch["instance"][start : offset[i]] = np.where(seg != -1, seg + num_instance, seg)
            start = offset[i]
    for key in [k for k in batch if k == "offset" or k.endswith("_offset")]:
        o = batch[key]
        batch[key] = np.concatenate([o[1:-1:2], o[-1:]])
    # recompute grid_coord per merged scene when grid_size known
    if "grid_coord" in batch and "grid_size" in batch:
        b = offset2batch_np(batch["offset"])
        gs = np.asarray(batch["grid_size"]).reshape(-1)[0]
        grid = np.floor(batch["coord"] / gs).astype(np.int64)
        mins = np.full((batch["offset"].shape[0], 3), np.iinfo(np.int64).max)
        np.minimum.at(mins, b, grid)
        batch["grid_coord"] = grid - mins[b]
    return batch


def pad_to_point_batch(
    batch: dict,
    capacity: int,
    num_scenes: Optional[int] = None,
    drop_overflow: bool = True,
) -> Dict[str, np.ndarray]:
    """Pad a collated ragged batch into fixed-capacity PointBatch arrays.

    Returns a dict with coord/feat/grid_coord/batch/segment (+ passthrough of
    per-scene arrays like `category`). Overflow (total points > capacity) is
    resolved by uniform random subsampling (training-time only behavior; size
    eval capacities to the data).
    """
    offset = np.asarray(batch["offset"])
    n_total = int(offset[-1])
    b_ids = offset2batch_np(offset).astype(np.int32)
    if num_scenes is None:
        num_scenes = len(offset)

    if n_total > capacity:
        if not drop_overflow:
            raise ValueError(f"batch has {n_total} points > capacity {capacity}")
        keep = np.sort(np.random.choice(n_total, capacity, replace=False))
    else:
        keep = None

    def _sel(a):
        return a if keep is None else a[keep]

    n = capacity
    eff = min(n_total, capacity)
    out: Dict[str, np.ndarray] = {}
    coord = _sel(np.asarray(batch["coord"], np.float32))
    out["coord"] = np.zeros((n, 3), np.float32)
    out["coord"][:eff] = coord
    if "feat" in batch:
        feat = _sel(np.asarray(batch["feat"], np.float32))
        out["feat"] = np.zeros((n, feat.shape[1]), np.float32)
        out["feat"][:eff] = feat
    if "grid_coord" in batch:
        g = _sel(np.asarray(batch["grid_coord"], np.int64)).astype(np.int32)
        out["grid_coord"] = np.zeros((n, 3), np.int32)
        out["grid_coord"][:eff] = g
    out["batch"] = np.full((n,), -1, np.int32)
    out["batch"][:eff] = _sel(b_ids)
    if "segment" in batch:
        s = _sel(np.asarray(batch["segment"]).reshape(-1).astype(np.int32))
        out["segment"] = np.full((n,), -1, np.int32)
        out["segment"][:eff] = s
    if "instance" in batch:
        s = _sel(np.asarray(batch["instance"]).reshape(-1).astype(np.int32))
        out["instance"] = np.full((n,), -1, np.int32)
        out["instance"][:eff] = s
    if "instance_centroid" in batch:
        c = _sel(np.asarray(batch["instance_centroid"], np.float32))
        out["instance_centroid"] = np.full((n, 3), -1.0, np.float32)
        out["instance_centroid"][:eff] = c
    if "condition" in batch:
        out["condition"] = batch["condition"]
    for key in ("category",):
        if key in batch:
            v = np.asarray(batch[key]).reshape(-1).astype(np.int32)
            padded = np.full((num_scenes,), -1, np.int32)
            padded[: len(v)] = v
            out[key] = padded
    out["num_scenes"] = num_scenes
    return out


def point_collate_fn(batch: List[dict], mix_prob: float = 0.0, capacity: Optional[int] = None, pad_multiple: int = 8192):
    """The training collate: ragged concat (+Mix3D) then static padding."""
    num_scenes = len(batch)
    merged = collate_fn(batch)
    if any(k.endswith("_offset") and k != "offset" for k in merged):
        if mix_prob > 0 and random.random() < mix_prob:
            # Mix3D for SSL views: merge scene pairs per view (reference
            # regroup_batch, datasets/utils.py:89)
            for key in [k for k in merged if k.endswith("_offset")]:
                o = merged[key]
                merged[key] = np.concatenate([o[1:-1:2], o[-1:]])
        if capacity is None:
            capacity = pad_multiple
        return pad_views_to_point_batch(merged, capacity, num_scenes=num_scenes)
    if mix_prob > 0 and random.random() < mix_prob:
        merged = mix3d(merged)
    if capacity is None:
        n_total = int(np.asarray(merged["offset"])[-1])
        capacity = max(pad_multiple, ((n_total + pad_multiple - 1) // pad_multiple) * pad_multiple)
    return pad_to_point_batch(merged, capacity, num_scenes=num_scenes)


VIEW_SUFFIXES = ("coord", "grid_coord", "origin_coord", "color", "normal", "feat", "segment")


def pad_views_to_point_batch(batch: dict, capacity: int, num_scenes: Optional[int] = None):
    """Pad multi-view SSL batches (view1_*/view2_* keys from
    ContrastiveViewsGenerator) into per-view fixed-capacity arrays."""
    out: Dict[str, np.ndarray] = {}
    prefixes = sorted({k[: -len("_offset")] for k in batch if k.endswith("_offset") and k != "offset"})
    assert prefixes, "no view offsets found"
    if num_scenes is None:
        num_scenes = len(np.asarray(batch[f"{prefixes[0]}_offset"]))
    for prefix in prefixes:
        offset = np.asarray(batch[f"{prefix}_offset"])
        n_total = int(offset[-1])
        b_ids = offset2batch_np(offset).astype(np.int32)
        if n_total > capacity:
            keep = np.sort(np.random.choice(n_total, capacity, replace=False))
        else:
            keep = None

        def _sel(a):
            return a if keep is None else a[keep]

        eff = min(n_total, capacity)
        out[f"{prefix}_batch"] = np.full((capacity,), -1, np.int32)
        out[f"{prefix}_batch"][:eff] = _sel(b_ids)
        for suf in VIEW_SUFFIXES:
            key = f"{prefix}_{suf}"
            if key not in batch:
                continue
            a = _sel(np.asarray(batch[key]))
            if suf in ("grid_coord", "segment"):
                a = a.astype(np.int32)
                fill = 0 if suf == "grid_coord" else -1
                padded = np.full((capacity,) + a.shape[1:], fill, np.int32)
            else:
                a = a.astype(np.float32)
                padded = np.zeros((capacity,) + a.shape[1:], np.float32)
            padded[:eff] = a
            out[key] = padded
    out["num_scenes"] = num_scenes
    return out
