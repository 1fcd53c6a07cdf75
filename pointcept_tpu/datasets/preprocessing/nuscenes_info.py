"""nuScenes lidarseg info builder.

Parity: reference `pointcept/datasets/preprocessing/nuscenes/
preprocess_nuscenes_info.py` — builds per-split pickle lists consumed by
`NuScenesDataset` (`{lidar_path, token, gt_segment_path}` relative to the raw
root). This compact rebuild targets the SEMANTIC SEGMENTATION pipeline: the
reference's detection-box annotations and multi-sweep pose chains are omitted
because `datasets/nuscenes.py` reads only the keyframe lidar + lidarseg labels.

Requires the `nuscenes-devkit` (not bundled in this image — run wherever the
devkit and the raw dataset live):

  python -m pointcept_tpu.datasets.preprocessing.nuscenes_info \
      --dataset_root <nuscenes_raw> --output_root data/nuscenes \
      --max_sweeps 10
"""

from __future__ import annotations

import argparse
import os
import pickle
from pathlib import Path


def build_split_infos(nusc, data_path, scene_names, with_gt=True):
    infos = []
    scene_tokens = {s["token"] for s in nusc.scene if s["name"] in scene_names}
    for sample in nusc.sample:
        if sample["scene_token"] not in scene_tokens:
            continue
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = nusc.get("sample_data", lidar_token)
        lidar_path = Path(nusc.get_sample_data_path(lidar_token))
        if not lidar_path.exists():
            continue
        info = {
            "token": sample["token"],
            "lidar_token": lidar_token,
            "lidar_path": str(lidar_path.relative_to(data_path)),
            "timestamp": sd["timestamp"],
        }
        if with_gt:
            seg = nusc.get("lidarseg", lidar_token)
            info["gt_segment_path"] = seg["filename"]
        infos.append(info)
    return infos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--version", default="v1.0-trainval")
    parser.add_argument("--max_sweeps", type=int, default=10, help="naming parity with the reference info files")
    args = parser.parse_args()

    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=args.version, dataroot=args.dataset_root, verbose=True)
    out = Path(args.output_root) / "info"
    out.mkdir(parents=True, exist_ok=True)
    if args.version == "v1.0-test":
        groups = {"test": (splits.test, False)}
    else:
        groups = {"train": (splits.train, True), "val": (splits.val, True)}
    for split, (scene_names, with_gt) in groups.items():
        infos = build_split_infos(nusc, args.dataset_root, set(scene_names), with_gt)
        path = out / f"nuscenes_infos_{args.max_sweeps}sweeps_{split}.pkl"
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        print(f"{split}: {len(infos)} samples -> {path}")


if __name__ == "__main__":
    main()
