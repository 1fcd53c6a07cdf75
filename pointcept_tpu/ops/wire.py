"""Compact device wire format for point-cloud inference/serving.

Production point-cloud serving is host->device bandwidth bound: a collated
ScanNet-scale scene is ~5.7 MB as float32 arrays (coord/feat/grid_coord/
batch/segment), which can exceed the device step time on PCIe- or
network-attached accelerators. This module defines a packed int32 wire format
(~1.2 MB/scene, 4.7x smaller) that the host encodes once per scene (numpy)
and the device decodes inside the jitted step (a few fused elementwise ops):

- ``wire_grid``  int32[N]: voxel grid coordinate, 3 x ``grid_bits`` bits
  (lossless; falls back to an unpacked int32[N,3] ``wire_grid3`` when the
  coordinate range needs more than 10 bits/axis).
- ``wire_cs``    int32[N]: RGB color as 3 x u8 (lossless for u8 source data,
  e.g. ScanNet ply colors) + semantic label in the top 8 bits (255 = ignore).
- ``wire_normal`` int32[N]: unit normal, octahedral-mapped to 2 x u16
  (max angular error ~1e-4 rad); the reserved word ``0x7FFFFFFF`` encodes a
  zero/absent normal exactly.
- ``wire_offset`` int32[num_scenes]: cumulative scene ends ("offset
  convention", reference ``pointcept/datasets/utils.py:50-55``); per-point
  scene ids and the trash-row mask (rows >= offset[-1]) are derived on device.

``coord`` is reconstructed as ``grid_coord * grid_size``: for serialized
models (PT-v3m1 family) float coordinates only influence logits through
``grid_coord``/serialization, so decoding is logit-exact; RPE/RoPE variants
that consume sub-voxel positions should ship ``coord`` uncompressed (the
packer keeps it when ``keep_coord=True``).

No reference counterpart: the CUDA reference feeds full-precision tensors
(same-host GPUs make H2D free); this module exists because TPU serving hosts
are commonly network-attached.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_ZERO_NORMAL_WORD = np.int32(0x7FFFFFFF)
_GRID_BITS = 10  # packed-path budget: 3 x 10 bits + 2 spare


# ---------------------------------------------------------------------------
# host-side encode (numpy)
# ---------------------------------------------------------------------------


def _oct_encode_np(normal: np.ndarray) -> np.ndarray:
    """Unit normal [N,3] -> packed octahedral int32 [N]."""
    n = np.asarray(normal, np.float32)
    norm = np.linalg.norm(n, axis=1)
    zero = norm < 1e-6
    safe = np.where(zero[:, None], np.array([0.0, 0.0, 1.0], np.float32), n)
    safe = safe / np.maximum(np.linalg.norm(safe, axis=1, keepdims=True), 1e-12)
    denom = np.abs(safe).sum(axis=1, keepdims=True)
    p = safe[:, :2] / denom
    south = safe[:, 2] < 0
    flipped = (1.0 - np.abs(p[:, ::-1])) * np.where(p >= 0, 1.0, -1.0)
    p = np.where(south[:, None], flipped, p)
    q = np.clip(np.rint((p * 0.5 + 0.5) * 65535.0), 0, 65535).astype(np.int64)
    word = (q[:, 0] | (q[:, 1] << 16)).astype(np.int64)
    word = np.where(zero, np.int64(_ZERO_NORMAL_WORD), word)
    return word.astype(np.uint32).view(np.int32)


def pack_points(
    arrays: Dict[str, np.ndarray],
    *,
    feat_layout: Sequence[str] = ("color", "normal"),
    keep_coord: bool = False,
) -> Dict[str, np.ndarray]:
    """Collated fixed-capacity batch (pad_to_point_batch output) -> wire dict.

    ``arrays`` must contain grid_coord/batch (and usually feat/segment);
    ``feat_layout`` names the feature blocks concatenated into ``feat``
    (only ``("color", "normal")`` / ``("color",)`` supported — the layouts the
    Collect transform produces for the flagship configs).
    """
    grid = np.asarray(arrays["grid_coord"], np.int64)
    n = grid.shape[0]
    batch = np.asarray(arrays["batch"], np.int32)
    eff = int((batch >= 0).sum())
    if eff and not (batch[:eff] >= 0).all():
        raise ValueError("wire format requires contiguous scenes (trash rows last)")
    num_scenes = int(batch[:eff].max()) + 1 if eff else 1
    offset = np.searchsorted(batch[:eff], np.arange(num_scenes), side="right").astype(np.int32)

    out: Dict[str, np.ndarray] = {"wire_offset": offset}
    if grid.min() < 0:
        raise ValueError("grid_coord must be non-negative")
    if grid.max() < (1 << _GRID_BITS):
        out["wire_grid"] = (
            grid[:, 0] | (grid[:, 1] << _GRID_BITS) | (grid[:, 2] << (2 * _GRID_BITS))
        ).astype(np.int32)
    else:
        out["wire_grid3"] = grid.astype(np.int32)

    seg = np.asarray(arrays.get("segment", np.full((n,), -1)), np.int64)
    if (seg > 254).any() or (seg < -1).any():
        raise ValueError("segment labels must be in [-1, 254] for the wire format")
    seg8 = np.where(seg < 0, 255, seg)

    feat = arrays.get("feat")
    if feat is not None and list(feat_layout)[:1] == ["color"]:
        color = np.clip(np.rint(np.asarray(feat[:, :3], np.float32) * 255.0), 0, 255).astype(
            np.int64
        )
    else:
        color = np.zeros((n, 3), np.int64)
    out["wire_cs"] = (
        color[:, 0] | (color[:, 1] << 8) | (color[:, 2] << 16) | (seg8 << 24)
    ).astype(np.uint32).view(np.int32)

    if feat is not None and "normal" in feat_layout:
        out["wire_normal"] = _oct_encode_np(feat[:, 3:6])
    if keep_coord:
        out["coord"] = np.asarray(arrays["coord"], np.float32)
    return out


# ---------------------------------------------------------------------------
# device-side decode (jax.numpy; call inside jit)
# ---------------------------------------------------------------------------


def _oct_decode_jnp(word):
    import jax.numpy as jnp

    u = word.astype(jnp.uint32)
    zero = word == _ZERO_NORMAL_WORD
    qx = (u & 0xFFFF).astype(jnp.float32)
    qy = ((u >> 16) & 0xFFFF).astype(jnp.float32)
    p = jnp.stack([qx, qy], axis=1) / 65535.0 * 2.0 - 1.0
    z = 1.0 - jnp.abs(p).sum(axis=1)
    south = z < 0
    flipped = (1.0 - jnp.abs(p[:, ::-1])) * jnp.where(p >= 0, 1.0, -1.0)
    xy = jnp.where(south[:, None], flipped, p)
    n = jnp.concatenate([xy, z[:, None]], axis=1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    return jnp.where(zero[:, None], 0.0, n)


def unpack_points(
    wire: Dict[str, "np.ndarray"],
    *,
    grid_size: float,
    num_scenes: int,
    with_segment: bool = True,
) -> Dict[str, "np.ndarray"]:
    """Wire dict -> PointBatch input arrays (jnp). Shapes are static: the
    capacity is the wire arrays' length and ``num_scenes`` is a python int."""
    import jax.numpy as jnp

    if "wire_grid" in wire:
        w = wire["wire_grid"].astype(jnp.int32)
        mask = (1 << _GRID_BITS) - 1
        grid = jnp.stack(
            [w & mask, (w >> _GRID_BITS) & mask, (w >> (2 * _GRID_BITS)) & mask], axis=1
        )
    else:
        grid = wire["wire_grid3"].astype(jnp.int32)
    n = grid.shape[0]

    offset = wire["wire_offset"]
    idx = jnp.arange(n, dtype=jnp.int32)
    batch = jnp.searchsorted(offset, idx, side="right").astype(jnp.int32)
    trash = idx >= offset[num_scenes - 1]
    batch = jnp.where(trash, -1, batch)
    grid = jnp.where(trash[:, None], 0, grid)

    cs = wire["wire_cs"].astype(jnp.uint32)
    color = (
        jnp.stack([cs & 0xFF, (cs >> 8) & 0xFF, (cs >> 16) & 0xFF], axis=1).astype(jnp.float32)
        / 255.0
    )
    parts = [jnp.where(trash[:, None], 0.0, color)]
    if "wire_normal" in wire:
        normal = _oct_decode_jnp(wire["wire_normal"].astype(jnp.int32))
        parts.append(jnp.where(trash[:, None], 0.0, normal))
    feat = jnp.concatenate(parts, axis=1)

    coord = wire.get("coord")
    if coord is None:
        coord = grid.astype(jnp.float32) * grid_size
    out = {"coord": coord, "feat": feat, "grid_coord": grid, "batch": batch}
    if with_segment:
        seg = ((cs >> 24) & 0xFF).astype(jnp.int32)
        out["segment"] = jnp.where(seg == 255, -1, seg)
    return out


# ---------------------------------------------------------------------------
# raw word-packed wire (lossless, any float32/int32 array set)
# ---------------------------------------------------------------------------


def raw_manifest(arrays: Dict[str, "np.ndarray"]):
    """Static manifest (name, dtype, shape) for `pack_raw`/`unpack_raw`.

    Shapes must be identical across calls sharing one jitted consumer (the
    tester pads every fragment to a fixed capacity, so they are).
    """
    out = []
    for k in sorted(arrays):
        v = arrays[k]
        dt = np.dtype(v.dtype)
        if dt == np.int64:
            dt = np.dtype(np.int32)
        if dt not in (np.dtype(np.float32), np.dtype(np.int32)):
            raise ValueError(f"pack_raw supports f32/i32, got {k}: {v.dtype}")
        out.append((k, dt.name, tuple(int(s) for s in v.shape)))
    return tuple(out)


def pack_raw(arrays: Dict[str, "np.ndarray"], manifest=None) -> "np.ndarray":
    """Pack arrays into ONE contiguous int32 word buffer (host side).

    Network-attached accelerators pay a fixed per-transfer RPC floor
    (~24 ms measured through the bench tunnel); shipping one buffer instead
    of one per array amortizes it. float32 is bit-cast (lossless); int64 is
    range-checked and narrowed to int32.
    """
    manifest = raw_manifest(arrays) if manifest is None else manifest
    parts = []
    for k, dtname, shape in manifest:
        v = np.asarray(arrays[k])
        assert tuple(v.shape) == shape, f"{k}: {v.shape} != manifest {shape}"
        if v.dtype == np.int64:
            assert np.abs(v).max(initial=0) < 2**31, f"{k} overflows int32"
            v = v.astype(np.int32)
        if v.dtype == np.float32:
            v = v.view(np.int32)
        parts.append(np.ascontiguousarray(v, np.int32).reshape(-1))
    return np.concatenate(parts) if parts else np.zeros((0,), np.int32)


def unpack_raw(words, manifest) -> Dict[str, "jnp.ndarray"]:
    """Device-side decode of `pack_raw` output (call inside jit)."""
    import jax
    import jax.numpy as jnp

    out = {}
    pos = 0
    for k, dtname, shape in manifest:
        n = int(np.prod(shape)) if shape else 1
        chunk = jax.lax.slice(words, (pos,), (pos + n,))
        if dtname == "float32":
            arr = jax.lax.bitcast_convert_type(chunk, jnp.float32)
        else:
            arr = chunk
        out[k] = arr.reshape(shape)
        pos += n
    return out
