"""PartNetE preprocessing.

Parity: reference `pointcept/datasets/preprocessing/partnete/preprocess_partnete.py`
— per-object folders carrying `pc.ply` + `label.npy` are converted in place to
coord / normal / color / segment npy files. Own PLY reader; normals come from
the PLY when present, else kNN-PCA estimation (`datasets/variants.py`, the
open3d `estimate_normals` equivalent).

Usage:
  python -m pointcept_tpu.datasets.preprocessing.partnete --dataset_root <partnete>
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply
from pointcept_tpu.datasets.variants import estimate_pca_normals


def process_folder(target_dir):
    ply_path = os.path.join(target_dir, "pc.ply")
    label_path = os.path.join(target_dir, "label.npy")
    if os.path.exists(ply_path):
        coord, color, extras, _faces = read_scene_ply(ply_path)
        np.save(os.path.join(target_dir, "coord.npy"), coord.astype(np.float32))
        if all(k in extras for k in ("nx", "ny", "nz")):
            normal = np.stack([extras["nx"], extras["ny"], extras["nz"]], axis=1)
        else:
            normal = estimate_pca_normals(coord.astype(np.float64), k=30)
        np.save(os.path.join(target_dir, "normal.npy"), normal.astype(np.float32))
        if color is not None:
            np.save(os.path.join(target_dir, "color.npy"), color[:, :3].astype(np.uint8))
    if os.path.exists(label_path):
        label = np.load(label_path).reshape(-1).astype(np.int32)
        np.save(os.path.join(target_dir, "segment.npy"), label)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    args = parser.parse_args()
    for folder in sorted(glob.glob(os.path.join(args.dataset_root, "*", "*", "*"))):
        if os.path.isdir(folder):
            process_folder(folder)
            print(folder)


if __name__ == "__main__":
    main()
