"""Minimal PLY reader/writer (no external deps).

Replaces the vendored `plyfile.py` the reference ships for preprocessing
(`datasets/preprocessing/scannet/scannet_pair/plyfile.py`). Supports ascii and
binary_little_endian, element/property declarations, and list properties
(for faces).
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Returns {element_name: structured array}; list properties become object
    arrays unless fixed-size (faces of 3 become [N, 3])."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ('list', idx_t, val_t, name)])
        while True:
            line = f.readline().strip().decode()
            if line.startswith("comment"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                elements.append((name, int(count), []))
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", _TYPES[parts[2]], _TYPES[parts[3]], parts[4]))
                else:
                    elements[-1][2].append((parts[2], _TYPES[parts[1]]))
            elif line == "end_header":
                break

        out = {}
        if fmt == "ascii":
            for name, count, props in elements:
                rows = []
                for _ in range(count):
                    vals = f.readline().split()
                    rows.append(vals)
                if any(p[0] == "list" for p in props):
                    # assume uniform list size (mesh faces)
                    arr = np.array([[float(v) for v in r[1:]] for r in rows])
                    out[name] = arr
                else:
                    dt = np.dtype([(p[0], p[1]) for p in props])
                    arr = np.zeros(count, dt)
                    for i, r in enumerate(rows):
                        for j, p in enumerate(props):
                            arr[i][p[0]] = float(r[j])
                    out[name] = arr
            return out

        assert fmt == "binary_little_endian", f"unsupported format {fmt}"
        for name, count, props in elements:
            if any(p[0] == "list" for p in props):
                if len(props) == 1:
                    # single list property (plain mesh faces): parse row by row
                    _, idx_t, val_t, _pname = props[0]
                    idx_size = np.dtype(idx_t).itemsize
                    val_size = np.dtype(val_t).itemsize
                    rows = []
                    for _ in range(count):
                        (k,) = np.frombuffer(f.read(idx_size), dtype=idx_t)
                        rows.append(np.frombuffer(f.read(val_size * int(k)), dtype=val_t))
                    if count and all(len(r) == len(rows[0]) for r in rows):
                        out[name] = np.stack(rows)
                    else:
                        out[name] = np.array(rows, dtype=object)
                else:
                    # mixed list/scalar element (e.g. Matterport faces with
                    # vertex_indices + material/segment/category ids): return a
                    # dict of per-property arrays
                    cols = {(p[3] if p[0] == "list" else p[0]): [] for p in props}
                    for _ in range(count):
                        for p in props:
                            if p[0] == "list":
                                _, idx_t, val_t, pname = p
                                (k,) = np.frombuffer(f.read(np.dtype(idx_t).itemsize), dtype=idx_t)
                                cols[pname].append(
                                    np.frombuffer(f.read(np.dtype(val_t).itemsize * int(k)), dtype=val_t)
                                )
                            else:
                                pname, t = p
                                (val,) = np.frombuffer(f.read(np.dtype(t).itemsize), dtype=t)
                                cols[pname].append(val)
                    packed = {}
                    for key, vals in cols.items():
                        if vals and isinstance(vals[0], np.ndarray):
                            if all(len(v) == len(vals[0]) for v in vals):
                                packed[key] = np.stack(vals) if vals else np.zeros((0,))
                            else:
                                packed[key] = np.array(vals, dtype=object)
                        else:
                            packed[key] = np.asarray(vals)
                    out[name] = packed
            else:
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                out[name] = np.frombuffer(f.read(dt.itemsize * count), dtype=dt).copy()
        return out


def read_scene_ply(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Convenience: returns (coord [N,3] f32, color [N,3] u8 or None,
    extra vertex fields dict, faces [M,3] or None)."""
    data = read_ply(path)
    v = data["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    color = None
    if "red" in v.dtype.names:
        color = np.stack([v["red"], v["green"], v["blue"]], axis=1)
    extras = {n: np.asarray(v[n]) for n in v.dtype.names if n not in ("x", "y", "z", "red", "green", "blue", "alpha")}
    faces = data.get("face")
    if faces is not None:
        faces = np.asarray(faces).astype(np.int64)
    return coord, color, extras, faces
