"""ScanNet++ preprocessing.

Parity: reference `pointcept/datasets/preprocessing/scannetpp/preprocess_scannetpp.py`
(mesh_aligned_0.05.ply + segments.json + segments_anno.json -> per-scene npy
folders of coord/color/normal/segment/instance + optional superpoints via the
Felzenszwalb mesh segmentation). Uses our own PLY reader (`preprocessing/ply.py`)
and the native clustering library (`ops/clustering.segment_mesh`) instead of
open3d + the pointseg extension.

Usage:
  python -m pointcept_tpu.datasets.preprocessing.scannetpp \
      --dataset_root <scannetpp> --output_root data/scannetpp \
      --label_mapping <metadata/semantic_benchmark/map_benchmark.csv> \
      --class_names <metadata/semantic_benchmark/top100.txt>
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply


def face_normals(coord, faces):
    a = coord[faces[:, 1]] - coord[faces[:, 0]]
    b = coord[faces[:, 2]] - coord[faces[:, 0]]
    fn = np.cross(a, b)
    vn = np.zeros_like(coord)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)


def parse_scene(scene_path, save_path, class2idx, instance_classes=None, with_superpoint=True):
    scene_path = Path(scene_path)
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    coord, color, extras, faces = read_scene_ply(str(scene_path / "mesh_aligned_0.05.ply"))
    n = coord.shape[0]
    if all(k in extras for k in ("nx", "ny", "nz")):
        normal = np.stack([extras["nx"], extras["ny"], extras["nz"]], axis=1).astype(np.float32)
    elif faces is not None:
        normal = face_normals(coord, faces).astype(np.float32)
    else:
        normal = np.zeros_like(coord)
    np.save(save_path / "coord.npy", coord.astype(np.float32))
    if color is not None:
        np.save(save_path / "color.npy", color.astype(np.uint8))
    np.save(save_path / "normal.npy", normal)

    if with_superpoint and faces is not None:
        try:
            from pointcept_tpu.ops.clustering import segment_mesh

            superpoint = segment_mesh(coord, faces)
            np.save(save_path / "superpoint.npy", superpoint.astype(np.int64))
        except Exception:
            pass

    segs_path = scene_path / "segments.json"
    anno_path = scene_path / "segments_anno.json"
    semantic = np.full(n, -1, np.int16)
    instance = np.full(n, -1, np.int16)
    if segs_path.is_file() and anno_path.is_file():
        with open(segs_path) as f:
            seg_indices = np.asarray(json.load(f)["segIndices"], np.uint32)
        with open(anno_path) as f:
            anno = json.load(f)
        # reference :97-135: paint instances by segment groups, at most 3 labels
        # per vertex, major label wins for the semantic map
        labels_used = np.zeros(n, np.int8)
        for inst_id, group in enumerate(anno["segGroups"]):
            label = group.get("label")
            if label not in class2idx:
                continue
            cls = class2idx[label]
            mask = np.isin(seg_indices[: n], np.asarray(group["segments"])) & (labels_used < 3)
            semantic[mask] = cls
            if instance_classes is None or label in instance_classes:
                instance[mask] = inst_id
            labels_used[mask] += 1
    np.save(save_path / "segment.npy", semantic)
    np.save(save_path / "instance.npy", instance)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--class_names", required=True, help="txt with one class name per line")
    parser.add_argument("--splits", nargs="+", default=("train", "val"))
    args = parser.parse_args()

    class_names = [l.strip() for l in open(args.class_names) if l.strip()]
    class2idx = {c: i for i, c in enumerate(class_names)}

    data_root = Path(args.dataset_root) / "data"
    split_dir = Path(args.dataset_root) / "splits"
    for split in args.splits:
        split_file = split_dir / f"nvs_sem_{split}.txt"
        scenes = [l.strip() for l in open(split_file) if l.strip()] if split_file.is_file() else []
        for scene in scenes:
            print(f"[{split}] {scene}")
            parse_scene(
                data_root / scene / "scans",
                Path(args.output_root) / split / scene,
                class2idx,
            )


if __name__ == "__main__":
    main()
