"""HK Remote mesh -> sampled point cloud export for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/hk/
preprocess_hk.py` — every `*.obj` mesh under the dataset root is uniformly
surface-sampled (reference: open3d `sample_points_uniformly`, 10M points) and
written as `train/<mesh_parent_name>/{coord,color,normal}.npy` with u8-range
int32 colors. This rebuild carries its own minimal OBJ/MTL reader (vertex
colors, per-material Kd fallback, optional map_Kd texture via PIL) and reuses
the hm3d area-weighted surface sampler — no open3d.

    python -m pointcept_tpu.datasets.preprocessing.concerto.hk \
        --dataset_root raw_hk --output_root data/hk [--num_points 10000000]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.hm3d import (
    _vertex_normals,
    sample_surface,
    texture_lookup,
)


def read_obj(path: str):
    """Minimal OBJ reader.

    Returns dict(pos [V,3], vcolor [V,3] or None, uv [V,2] or None,
    faces [F,3] int64, face_kd [F,3] per-face diffuse color, texture PIL
    image or None). Polygons are fan-triangulated; `f v/vt/vn` indices are
    resolved so position/uv share one vertex table (last-wins on conflicts,
    adequate for scan meshes where vt is per-vertex).
    """
    pos, vcol, uvs = [], [], []
    faces, face_mat = [], []
    materials = {None: (0.8, 0.8, 0.8)}
    tex_by_mat = {}
    cur_mat = None
    mtl_dir = os.path.dirname(path)

    def load_mtl(p):
        name = None
        try:
            with open(p) as f:
                for ln in f:
                    t = ln.split()
                    if not t:
                        continue
                    if t[0] == "newmtl":
                        name = t[1]
                        materials[name] = (0.8, 0.8, 0.8)
                    elif t[0] == "Kd" and name is not None:
                        materials[name] = tuple(float(x) for x in t[1:4])
                    elif t[0] == "map_Kd" and name is not None:
                        tex_by_mat[name] = os.path.join(mtl_dir, t[-1])
        except OSError:
            pass

    uv_of_vertex = {}
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            if t[0] == "v":
                pos.append([float(x) for x in t[1:4]])
                if len(t) >= 7:  # v x y z r g b (scan-mesh vertex colors)
                    vcol.append([float(x) for x in t[4:7]])
            elif t[0] == "vt":
                uvs.append([float(t[1]), float(t[2])])
            elif t[0] == "mtllib":
                load_mtl(os.path.join(mtl_dir, t[-1]))
            elif t[0] == "usemtl":
                cur_mat = t[1]
            elif t[0] == "f":
                idx = []
                for w in t[1:]:
                    parts = w.split("/")
                    vi = int(parts[0])
                    vi = vi - 1 if vi > 0 else len(pos) + vi
                    if len(parts) > 1 and parts[1]:
                        ti = int(parts[1])
                        uv_of_vertex[vi] = ti - 1 if ti > 0 else len(uvs) + ti
                    idx.append(vi)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
                    face_mat.append(cur_mat)

    pos = np.asarray(pos, np.float64)
    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    vcolor = np.asarray(vcol, np.float64) if len(vcol) == len(pos) and vcol else None
    uv = None
    if uvs and uv_of_vertex:
        uv = np.zeros((len(pos), 2))
        src = np.asarray(uvs, np.float64)
        for vi, ti in uv_of_vertex.items():
            if 0 <= ti < len(src):
                uv[vi] = src[ti]
    face_kd = np.asarray([materials.get(m, materials[None]) for m in face_mat])
    texture = None
    tex_paths = [p for m, p in tex_by_mat.items() if os.path.exists(p)]
    if tex_paths:
        try:
            from PIL import Image

            texture = Image.open(tex_paths[0]).convert("RGB")
        except Exception:
            texture = None
    return dict(pos=pos, vcolor=vcolor, uv=uv, faces=faces, face_kd=face_kd, texture=texture)


def sample_obj(path: str, num_points: int, seed: int = 0):
    """-> (coord [N,3] f32, color [N,3] int32 u8-range, normal [N,3] f32)."""
    mesh = read_obj(path)
    pos, faces = mesh["pos"], mesh["faces"]
    if len(faces) == 0:
        raise ValueError(f"{path}: no faces")
    rng = np.random.default_rng(seed)
    pts, fidx, bary = sample_surface(pos, faces, num_points, rng)
    vn = _vertex_normals(pos, faces)
    normal = np.einsum("nij,ni->nj", vn[faces[fidx]], bary)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-12)
    if mesh["texture"] is not None and mesh["uv"] is not None:
        uv = np.einsum("nij,ni->nj", mesh["uv"][faces[fidx]], bary)
        color = texture_lookup(uv, mesh["texture"]).astype(np.float64)
    elif mesh["vcolor"] is not None:
        c = np.einsum("nij,ni->nj", mesh["vcolor"][faces[fidx]], bary)
        color = c * 255.0 if c.max(initial=0.0) <= 1.0 else c
    else:
        color = np.broadcast_to(mesh["face_kd"][fidx] * 255.0, pts.shape)
    return (
        pts.astype(np.float32),
        np.clip(np.rint(color), 0, 255).astype(np.int32),
        normal.astype(np.float32),
    )


def process_mesh(obj_path: str, output_dir: str, num_points: int, seed: int = 0):
    name = Path(obj_path).parent.name
    out = os.path.join(output_dir, name)
    if os.path.exists(os.path.join(out, "coord.npy")):
        return name
    coord, color, normal = sample_obj(obj_path, num_points, seed=seed)
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "coord.npy"), coord)
    np.save(os.path.join(out, "color.npy"), color)
    np.save(os.path.join(out, "normal.npy"), normal)
    return name


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_points", type=int, default=10_000_000)
    args = parser.parse_args()
    out_dir = os.path.join(args.output_root, "train")
    os.makedirs(out_dir, exist_ok=True)
    objs = sorted(str(p) for p in Path(args.dataset_root).rglob("*.obj"))
    print(f"Found {len(objs)} .obj files.")
    for i, p in enumerate(objs):
        try:
            print(process_mesh(p, out_dir, args.num_points, seed=i))
        except Exception as e:  # noqa: BLE001 (reference also skips bad meshes)
            print(f"fail {p}: {e}")


if __name__ == "__main__":
    main()
