"""Host-side clustering ops (ctypes bindings to native/clustering.cpp).

TPU-native replacements for the reference's CUDA/C++ instance-clustering and
superpoint libraries:
* `bfs_cluster`: `libs/pointgroup_ops` (`ballquery_batch_p` + `bfs_cluster`,
  `functions/functions.py:6-40`, `src/bfs_cluster.cpp:21-145`) — fixed-radius
  neighbor graph + label-restricted BFS connected components. Eval-time only,
  outside the jit path (same design as the reference, whose BFS also runs on CPU).
* `segment_graph`: `libs/pointseg` Felzenszwalb superpoint segmentation
  (`src/segmentor.cpp`), used by ScanNet++ preprocessing.

The shared library is compiled on first use with g++ if missing; a (slow) numpy
fallback keeps tests runnable without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    from pointcept_tpu.utils.native_build import build_native

    lib_path = build_native(os.path.join(_NATIVE_DIR, "clustering.cpp"))
    if lib_path is None:
        return None
    lib = ctypes.CDLL(lib_path)
    lib.bfs_cluster.restype = ctypes.c_int
    lib.bfs_cluster.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.segment_graph.restype = ctypes.c_int
    lib.segment_graph.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def bfs_cluster(
    coords: np.ndarray,
    batch: np.ndarray,
    labels: np.ndarray,
    radius: float,
    min_points: int = 50,
    max_neighbors: int = 300,
) -> Tuple[np.ndarray, int]:
    """Returns (cluster_id [n] int32 with -1 unclustered, num_clusters)."""
    coords = np.ascontiguousarray(coords, np.float32)
    batch = np.ascontiguousarray(batch, np.int32)
    labels = np.ascontiguousarray(labels, np.int32)
    n = coords.shape[0]
    out = np.empty(n, np.int32)
    lib = _load()
    if lib is not None:
        num = lib.bfs_cluster(
            _ptr(coords, ctypes.c_float),
            _ptr(batch, ctypes.c_int32),
            _ptr(labels, ctypes.c_int32),
            n,
            float(radius),
            int(min_points),
            int(max_neighbors),
            _ptr(out, ctypes.c_int32),
        )
        return out, int(num)
    return _bfs_cluster_numpy(coords, batch, labels, radius, min_points)


def _bfs_cluster_numpy(coords, batch, labels, radius, min_points):
    """Reference-quality fallback (O(n^2) per label group; tests only)."""
    n = coords.shape[0]
    out = np.full(n, -1, np.int32)
    num = 0
    visited = np.zeros(n, bool)
    for seed in range(n):
        if visited[seed]:
            continue
        group = (batch == batch[seed]) & (labels == labels[seed]) & ~visited
        comp = [seed]
        visited[seed] = True
        frontier = [seed]
        while frontier:
            i = frontier.pop()
            d = np.linalg.norm(coords - coords[i], axis=1)
            nbr = np.where(group & ~visited & (d <= radius))[0]
            for j in nbr:
                visited[j] = True
                comp.append(int(j))
                frontier.append(int(j))
            group = group & ~visited
        if len(comp) >= min_points:
            out[comp] = num
            num += 1
    return out, num


def segment_graph(
    vertices: np.ndarray,
    edges: np.ndarray,
    weights: np.ndarray,
    k_thresh: float = 0.01,
    seg_min: int = 20,
) -> np.ndarray:
    """Felzenszwalb superpoints over an edge graph; returns [n] int32 ids."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    edges = np.ascontiguousarray(edges, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    n = vertices.shape[0]
    m = edges.shape[0]
    out = np.empty(n, np.int32)
    lib = _load()
    assert lib is not None, "native clustering library unavailable"
    lib.segment_graph(
        _ptr(vertices, ctypes.c_float),
        n,
        _ptr(edges, ctypes.c_int32),
        _ptr(weights, ctypes.c_float),
        m,
        float(k_thresh),
        int(seg_min),
        _ptr(out, ctypes.c_int32),
    )
    return out


def segment_mesh(vertices: np.ndarray, faces: np.ndarray, k_thresh: float = 0.01, seg_min: int = 20) -> np.ndarray:
    """Superpoints from a triangle mesh (reference `pointseg.segment_mesh`,
    `libs/pointseg/pointseg/functions.py:6`): edge weights from normal variation."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    # vertex normals from face normals
    v0, v1, v2 = vertices[faces[:, 0]], vertices[faces[:, 1]], vertices[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    fn /= np.linalg.norm(fn, axis=1, keepdims=True) + 1e-12
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True) + 1e-12
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]).astype(np.int32)
    w = 1.0 - np.abs(np.sum(vn[edges[:, 0]] * vn[edges[:, 1]], axis=1)).astype(np.float32)
    return segment_graph(vertices, edges, w, k_thresh, seg_min)
