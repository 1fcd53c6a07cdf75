"""ARKitScenes mesh preprocessing.

Parity: reference `pointcept/datasets/preprocessing/arkitscenes/
preprocess_arkitscenes_mesh.py` — reads `3dod/*/*/*_mesh.ply` scene meshes,
computes area-weighted vertex normals from faces, and writes per-scene npy
folders (coord / color / normal) under the Training/Validation split dirs.
Own PLY reader (no plyfile/pandas).

Usage:
  python -m pointcept_tpu.datasets.preprocessing.arkitscenes \
      --dataset_root <arkitscenes with 3dod/> --output_root data/arkitscenes
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply


def vertex_normals(coord, faces):
    """Area-weighted vertex normals (reference face_normal/vertex_normal)."""
    v01 = coord[faces[:, 1]] - coord[faces[:, 0]]
    v02 = coord[faces[:, 2]] - coord[faces[:, 0]]
    nf = np.cross(v01, v02)  # length = 2 * area (weighting built in)
    nv = np.zeros_like(coord)
    for i in range(3):
        np.add.at(nv, faces[:, i], nf)
    return nv / (np.sqrt(np.sum(nv**2, axis=1, keepdims=True)) + 1e-8)


def parse_scene(scene_path, output_root):
    scene_path = Path(scene_path)
    split = scene_path.parent.parent.name
    scene_id = scene_path.parent.name
    coord, color, _extras, faces = read_scene_ply(str(scene_path))
    if faces is None:
        return
    normal = vertex_normals(coord.astype(np.float64), faces).astype(np.float32)
    out = Path(output_root) / split / scene_id
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "coord.npy", coord.astype(np.float32))
    if color is not None:
        np.save(out / "color.npy", color.astype(np.uint8))
    np.save(out / "normal.npy", normal)
    print(f"[{split}] {scene_id}: {coord.shape[0]} pts")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    args = parser.parse_args()
    for p in sorted(glob.glob(os.path.join(args.dataset_root, "3dod", "*", "*", "*_mesh.ply"))):
        parse_scene(p, args.output_root)


if __name__ == "__main__":
    main()
