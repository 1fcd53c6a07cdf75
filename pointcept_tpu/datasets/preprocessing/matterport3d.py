"""Matterport3D region-mesh preprocessing.

Parity: reference `pointcept/datasets/preprocessing/matterport3d/
preprocess_matterport3d_mesh.py` — reads each region_segmentations PLY
(vertices carry color+normal, faces carry `category_id`), maps raw category
ids -> nyu40 labels via the official `category_mapping.tsv`, paints vertices
with their faces' labels, and writes per-region npy folders split by the
official train/val/test scene lists. Uses our own PLY reader (no plyfile).

Usage:
  python -m pointcept_tpu.datasets.preprocessing.matterport3d \
      --dataset_root <matterport_v1> --output_root data/matterport3d \
      --meta_root <meta_data dir with category_mapping.tsv + scene splits>
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.ply import read_ply


def load_category_mapping(tsv_path):
    """raw category index -> nyu40 id (0 = unmapped), from the official tsv."""
    ids = [0]  # category ids are 1-based; slot 0 = unmapped/-1
    with open(tsv_path, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            v = row.get("nyu40id", "")
            ids.append(int(v) if v.strip() else 0)
    return np.asarray(ids, np.int32)


def parse_region(ply_path, output_dir, mapping):
    data = read_ply(str(ply_path))
    v = data["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    color = (
        np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.uint8)
        if "red" in v.dtype.names
        else np.zeros((len(coord), 3), np.uint8)
    )
    normal = (
        np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float32)
        if "nx" in v.dtype.names
        else np.zeros_like(coord)
    )
    face = data.get("face")
    segment = np.full(coord.shape[0], -1, np.int16)
    if isinstance(face, dict) and "category_id" in face:
        cat = np.asarray(face["category_id"], np.int64).copy()
        cat[cat < 0] = 0
        cat = np.clip(cat, 0, len(mapping) - 1)
        nyu = mapping[cat]  # per-face nyu40 id (0 = unmapped)
        idx = np.asarray(face["vertex_indices"], np.int64)  # [F, 3]
        # paint vertices with face labels; later faces win like the reference
        for k in range(3):
            sel = nyu > 0
            segment[idx[sel, k]] = nyu[sel] - 1  # 0-based nyu40 classes
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "coord.npy", coord)
    np.save(out / "color.npy", color)
    np.save(out / "normal.npy", normal)
    np.save(out / "segment.npy", segment)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--meta_root", required=True)
    args = parser.parse_args()
    mapping = load_category_mapping(os.path.join(args.meta_root, "category_mapping.tsv"))
    splits = {}
    for split in ("train", "val", "test"):
        p = os.path.join(args.meta_root, f"scenes_{split}.txt")
        splits[split] = set(l.strip() for l in open(p)) if os.path.isfile(p) else set()
    plys = glob.glob(os.path.join(args.dataset_root, "v1", "scans", "*", "region_segmentations", "*.ply"))
    for ply_path in sorted(plys):
        scene = Path(ply_path).parents[1].name
        region = Path(ply_path).stem
        split = next((s for s, names in splits.items() if scene in names), "train")
        out = Path(args.output_root) / split / f"{scene}_{region}"
        print(f"[{split}] {scene}/{region}")
        parse_region(ply_path, out, mapping)


if __name__ == "__main__":
    main()
