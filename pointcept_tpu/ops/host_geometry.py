"""Host-side geometry precompute (ctypes wrapper over native/geometry.cpp).

The TPU-native answer to spconv's host-built rule maps: all data-dependent
index structures a serialized point transformer needs — curve-order argsorts,
SubM neighbor maps, patch partitions, pooling clusters — are pure functions of
(grid_coord, batch) and are computed on the host CPU in the data pipeline,
overlapped with device compute, instead of fighting the TPU's vector units
with irregular int work (reference counterparts: `Point.serialization`
`models/utils/structure.py:53-110`, `Point.sparsify` `:112-148`,
`get_padding_and_inverse` `point_transformer_v3m1_base.py:115-170`,
`SerializedPooling` `:341-444`).

`ptv3_geometry(...)` returns a flat dict of numpy arrays; fed through the batch
dict (keys prefixed ``geo_``), they ride into `PointBatch.geometry` and the
model consumes them instead of building the same structures in-graph.
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import Dict, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC_PATH = os.path.join(_NATIVE_DIR, "geometry.cpp")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from pointcept_tpu.utils.native_build import build_native

    lib_path = build_native(_SRC_PATH)
    if lib_path is None:
        raise RuntimeError(f"failed to build native geometry library from {_SRC_PATH}")
    lib = ctypes.CDLL(lib_path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    pp = ctypes.POINTER(ctypes.c_void_p)
    lib.ptv3_geometry.restype = ctypes.c_int
    lib.ptv3_geometry.argtypes = [
        i32p, i32p, f32p, i32p,  # grid, batch, coord, segment
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,  # n0, num_scenes, depth
        ctypes.c_int32, ctypes.c_int32, i32p,  # num_stages, num_orders, order_ids
        i64p, i32p, i64p, i32p,  # stage_caps, patch_sizes, patch_caps, strides
        ctypes.c_int32, ctypes.c_uint64,  # stem_kernel, shuffle_seed
        i32p, pp, pp, pp, pp, pp, pp, pp, pp,
    ]
    lib.subm_map.restype = ctypes.c_int
    lib.subm_map.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.serialize_orders.restype = ctypes.c_int
    lib.serialize_orders.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p]
    _lib = lib
    return lib


ORDER_IDS = {"z": 0, "z-trans": 1, "hilbert": 2, "hilbert-trans": 3}


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, typ=ctypes.c_int32):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def _ptr_array(arrs):
    return (ctypes.c_void_p * len(arrs))(*[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ptv3_stage_caps(capacity: int, pool_capacity_factors: Sequence[float]) -> list:
    """Static per-stage capacities — MUST match PointTransformerV3.__call__'s
    rounding (models/point_transformer_v3/point_transformer_v3.py)."""
    caps = [capacity]
    for f in pool_capacity_factors:
        caps.append(round_up(max(int(math.ceil(caps[-1] * f)), 128), 128))
    return caps


def patch_capacity(capacity: int, patch_size: int, num_scenes: int) -> int:
    """Static slot count — MUST match PointBatch.padded_capacity."""
    k = patch_size
    return ((capacity + k - 1) // k + num_scenes) * k


def ptv3_geometry(
    grid_coord: np.ndarray,
    batch: np.ndarray,
    coord: Optional[np.ndarray] = None,
    segment: Optional[np.ndarray] = None,
    *,
    num_scenes: int,
    depth: int,
    orders: Sequence[str] = ("z", "z-trans", "hilbert", "hilbert-trans"),
    stage_caps: Sequence[int],
    patch_sizes: Sequence[int],
    strides: Sequence[int] = (2, 2, 2, 2),
    stem_kernel: int = 5,
    shuffle_seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Compute the full PTv3 geometry plan for one collated batch shard.

    Returns a dict with keys:
      nbr_stem            [n0, 125]          (stem_kernel == 5 only)
      nbr3_{s}            [caps[s], 27]
      part_{s}_{oi}_slot  [P_s]
      part_{s}_{oi}_inv   [caps[s]]
      pool_{s}_cluster    [caps[s-1]]        (s >= 1; values in [0, caps[s]])
      pool_{s}_grid       [caps[s], 3]
      pool_{s}_batch      [caps[s]]
      pool_{s}_segment    [caps[s]]          (if segment given)
      pool_{s}_coord      [caps[s], 3] f32   (if coord given)
    """
    lib = _load()
    n0 = grid_coord.shape[0]
    num_stages = len(stage_caps)
    num_orders = len(orders)
    assert stage_caps[0] == n0, (stage_caps, n0)
    assert len(patch_sizes) == num_stages

    grid_coord = np.clip(_i32(grid_coord), 0, (1 << depth) - 1)
    batch = _i32(batch)
    coord_a = np.ascontiguousarray(coord, np.float32) if coord is not None else None
    seg_a = _i32(segment) if segment is not None else None
    order_ids = _i32([ORDER_IDS[o] for o in orders])
    caps64 = np.ascontiguousarray(stage_caps, np.int64)
    psz = _i32(patch_sizes)
    pcaps = np.ascontiguousarray(
        [patch_capacity(stage_caps[s], patch_sizes[s], num_scenes) for s in range(num_stages)],
        np.int64,
    )
    strides_a = _i32(strides)

    out: Dict[str, np.ndarray] = {}
    nbr_stem = np.empty((n0, 125), np.int32) if stem_kernel == 5 else None
    nbr3 = [np.empty((stage_caps[s], 27), np.int32) for s in range(num_stages)]
    slot2pt = [
        np.empty((int(pcaps[s]),), np.int32) for s in range(num_stages) for _ in range(num_orders)
    ]
    pt2slot = [
        np.empty((stage_caps[s],), np.int32) for s in range(num_stages) for _ in range(num_orders)
    ]
    pool_cluster = [np.empty((stage_caps[s],), np.int32) for s in range(num_stages - 1)]
    pool_grid = [np.empty((stage_caps[s + 1], 3), np.int32) for s in range(num_stages - 1)]
    pool_batch = [np.empty((stage_caps[s + 1],), np.int32) for s in range(num_stages - 1)]
    pool_segment = [np.empty((stage_caps[s + 1],), np.int32) for s in range(num_stages - 1)]
    pool_coord = [np.empty((stage_caps[s + 1], 3), np.float32) for s in range(num_stages - 1)]

    rc = lib.ptv3_geometry(
        _ptr(grid_coord),
        _ptr(batch),
        _ptr(coord_a, ctypes.c_float) if coord_a is not None else None,
        _ptr(seg_a) if seg_a is not None else None,
        n0,
        num_scenes,
        depth,
        num_stages,
        num_orders,
        _ptr(order_ids),
        _ptr(caps64, ctypes.c_int64),
        _ptr(psz),
        _ptr(pcaps, ctypes.c_int64),
        _ptr(strides_a),
        stem_kernel,
        ctypes.c_uint64(shuffle_seed & 0xFFFFFFFFFFFFFFFF),
        _ptr(nbr_stem) if nbr_stem is not None else None,
        _ptr_array(nbr3),
        _ptr_array(slot2pt),
        _ptr_array(pt2slot),
        _ptr_array(pool_cluster) if num_stages > 1 else None,
        _ptr_array(pool_grid) if num_stages > 1 else None,
        _ptr_array(pool_batch) if num_stages > 1 else None,
        _ptr_array(pool_segment) if num_stages > 1 else None,
        _ptr_array(pool_coord) if num_stages > 1 else None,
    )
    if rc != 0:
        raise RuntimeError(f"ptv3_geometry failed with code {rc}")

    if nbr_stem is not None:
        out["nbr_stem"] = nbr_stem
    for s in range(num_stages):
        out[f"nbr3_{s}"] = nbr3[s]
        for oi in range(num_orders):
            out[f"part_{s}_{oi}_slot"] = slot2pt[s * num_orders + oi]
            out[f"part_{s}_{oi}_inv"] = pt2slot[s * num_orders + oi]
    for s in range(1, num_stages):
        out[f"pool_{s}_cluster"] = pool_cluster[s - 1]
        out[f"pool_{s}_grid"] = pool_grid[s - 1]
        out[f"pool_{s}_batch"] = pool_batch[s - 1]
        if segment is not None:
            out[f"pool_{s}_segment"] = pool_segment[s - 1]
        if coord is not None:
            out[f"pool_{s}_coord"] = pool_coord[s - 1]
    return out


def ptv3_plan(backbone_cfg: dict, capacity: int, num_scenes: int) -> dict:
    """Derive the geometry plan from a PT-v3 backbone config dict.

    The capacities/patch layout MUST match what PointTransformerV3.__call__
    computes from the same config."""
    backbone_cfg = dict(backbone_cfg)
    # class-attribute defaults that differ per variant (models/point_transformer_v3)
    if str(backbone_cfg.get("type", "")) in ("PT-v3m2", "PT-v3m3"):
        backbone_cfg.setdefault("embed_mode", "linear")
    num_stages = len(backbone_cfg.get("enc_depths", (2, 2, 2, 6, 2)))
    order = backbone_cfg.get("order", ("z", "z-trans", "hilbert", "hilbert-trans"))
    orders = (order,) if isinstance(order, str) else tuple(order)
    factors = tuple(backbone_cfg.get("pool_capacity_factors", (0.5,) * (num_stages - 1)))
    caps = ptv3_stage_caps(capacity, factors)
    patch = backbone_cfg.get("enc_patch_size", (1024,) * num_stages)
    strides = tuple(backbone_cfg.get("stride", (2,) * (num_stages - 1)))
    stem = 5 if backbone_cfg.get("embed_mode", "conv") == "conv" else 0
    return dict(
        num_scenes=num_scenes,
        depth=int(backbone_cfg.get("serialize_depth", 12)),
        orders=orders,
        stage_caps=caps,
        patch_sizes=tuple(patch),
        strides=strides,
        stem_kernel=stem,
        grid_size=float(backbone_cfg.get("grid_size", 0.02)),
        shuffle=bool(backbone_cfg.get("shuffle_orders", True)),
    )


def geometry_arrays(plan: dict, arrays: dict, shuffle_seed: int = 0) -> dict:
    """Compute geometry for one collated shard dict (coord/grid_coord/batch/...)
    and return it as ``geo_*``-prefixed entries ready to merge into the batch."""
    grid = arrays.get("grid_coord")
    batch = np.asarray(arrays["batch"])
    if grid is None:
        # derive voxel coords exactly like PointBatch.with_grid_coord
        coord = np.asarray(arrays["coord"], np.float32)
        mask = batch >= 0
        grid = np.zeros_like(coord, dtype=np.int32)
        for b in np.unique(batch[mask]):
            sel = batch == b
            mins = coord[sel].min(axis=0)
            grid[sel] = np.floor((coord[sel] - mins) / plan["grid_size"]).astype(np.int32)
        grid = np.maximum(grid, 0)
    geo = ptv3_geometry(
        np.asarray(grid),
        batch,
        coord=np.asarray(arrays["coord"], np.float32) if "coord" in arrays else None,
        segment=np.asarray(arrays["segment"]) if arrays.get("segment") is not None else None,
        num_scenes=plan["num_scenes"],
        depth=plan["depth"],
        orders=plan["orders"],
        stage_caps=plan["stage_caps"],
        patch_sizes=plan["patch_sizes"],
        strides=plan["strides"],
        stem_kernel=plan["stem_kernel"],
        shuffle_seed=shuffle_seed if plan.get("shuffle", True) else 0,
    )
    return {f"geo_{k}": v for k, v in geo.items()}


def subm_map(grid_coord: np.ndarray, batch: np.ndarray, depth: int, kernel: int) -> np.ndarray:
    """Standalone SubM neighbor map [N, k^3] (SpUNet / tests)."""
    lib = _load()
    g = np.clip(_i32(grid_coord), 0, (1 << depth) - 1)
    b = _i32(batch)
    n = g.shape[0]
    out = np.empty((n, kernel**3), np.int32)
    rc = lib.subm_map(_ptr(g), _ptr(b), n, depth, kernel, _ptr(out))
    assert rc == 0
    return out


def serialize_orders(grid_coord: np.ndarray, batch: np.ndarray, depth: int, orders: Sequence[str]):
    """Standalone curve-order argsort: returns (order [S,N], inverse [S,N])."""
    lib = _load()
    g = np.clip(_i32(grid_coord), 0, (1 << depth) - 1)
    b = _i32(batch)
    n = g.shape[0]
    s = len(orders)
    order_ids = _i32([ORDER_IDS[o] for o in orders])
    order = np.empty((s, n), np.int32)
    inverse = np.empty((s, n), np.int32)
    rc = lib.serialize_orders(_ptr(g), _ptr(b), n, depth, s, _ptr(order_ids), _ptr(order), _ptr(inverse))
    assert rc == 0
    return order, inverse
