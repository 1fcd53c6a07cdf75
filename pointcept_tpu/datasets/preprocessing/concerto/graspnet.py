"""GraspNet pose splitting for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/graspnet/
preprocess_graspnet_poses.py` — each scene's `kinect/camera_poses.npy`
([256, 4, 4]) is split into one `pose/{i:04d}.npy` per frame so the Concerto
image dataset can address poses frame-wise like every other export.

    python -m pointcept_tpu.datasets.preprocessing.concerto.graspnet \
        --dataset_root data/graspnet
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def split_scene_poses(scene_kinect_dir: str) -> int:
    """Split camera_poses.npy into per-frame pose files. Returns #frames."""
    poses_file = os.path.join(scene_kinect_dir, "camera_poses.npy")
    if not os.path.exists(poses_file):
        return 0
    poses = np.load(poses_file)
    out_dir = os.path.join(scene_kinect_dir, "pose")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(poses.shape[0]):
        np.save(os.path.join(out_dir, f"{i:04d}.npy"), poses[i])
    return int(poses.shape[0])


def split_poses(dataset_root: str) -> dict:
    scenes_path = os.path.join(dataset_root, "scenes")
    out = {}
    for name in sorted(os.listdir(scenes_path)):
        scene = os.path.join(scenes_path, name)
        if not os.path.isdir(scene):
            continue
        out[name] = split_scene_poses(os.path.join(scene, "kinect"))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    args = parser.parse_args()
    for name, n in split_poses(args.dataset_root).items():
        print(f"{name}: {n} poses")


if __name__ == "__main__":
    main()
