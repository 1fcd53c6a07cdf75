"""Concerto image/correspondence export.

Parity: reference `pointcept/datasets/preprocessing/concerto/*` — a family of
per-dataset exporters that augment preprocessed point-cloud scenes with posed
RGB images and point->pixel correspondence tables, consumed by
`DefaultImagePointDataset` (`datasets/image_point.py`). This module is the
generic TPU-repo exporter: one pass over scenes of

    <scene>/coord.npy [+ color/normal/segment/instance .npy]
    <scene>/images/<frame>.jpg|png
    <scene>/poses/<frame>.txt        (4x4 camera-to-world)
    <scene>/intrinsic.txt            (3x3 or 4x4, shared) or per-frame
    <scene>/intrinsics/<frame>.txt

produces

    <output>/correspondence/<scene>/<frame>.npy   [M, 3] f32 (x_px, y_px, point)
    <output>/splits/<split>.json                  manifest

Correspondence rows follow the reference layout: pixel x, pixel y, point index
(only points that project inside the image with positive camera-frame depth);
`-ones((1, 3))` marks an image with no visible points (the loader skips it).
Occlusion is approximated by a per-pixel nearest-depth test at `z_tolerance`.

Usage:
    python -m pointcept_tpu.datasets.preprocessing.concerto_export \
        --dataset_root data/scannet_rgbd --output_root data/scannet_image \
        --split train [--max_images 8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from pointcept_tpu.datasets.outdoor_image import project_lidar_to_image


def _load_intrinsic(scene_dir, frame):
    per_frame = os.path.join(scene_dir, "intrinsics", f"{frame}.txt")
    shared = os.path.join(scene_dir, "intrinsic.txt")
    path = per_frame if os.path.exists(per_frame) else shared
    k = np.loadtxt(path)
    return k[:3, :3]


def _image_hw(path):
    from PIL import Image

    with Image.open(path) as img:
        w, h = img.size
    return h, w


def scene_correspondences(scene_dir, out_corr_dir, max_images=None, z_tolerance=0.05):
    """-> (image_paths, correspondence_paths) for the manifest."""
    coord = np.load(os.path.join(scene_dir, "coord.npy")).astype(np.float32)
    frames = sorted(
        glob.glob(os.path.join(scene_dir, "images", "*.jpg"))
        + glob.glob(os.path.join(scene_dir, "images", "*.png"))
    )
    if max_images is not None:
        frames = frames[:max_images]
    os.makedirs(out_corr_dir, exist_ok=True)
    images, corrs = [], []
    for img_path in frames:
        frame = os.path.splitext(os.path.basename(img_path))[0]
        pose_path = os.path.join(scene_dir, "poses", f"{frame}.txt")
        if not os.path.exists(pose_path):
            continue
        pose = np.loadtxt(pose_path)  # camera-to-world
        if not np.isfinite(pose).all():
            continue
        world_to_cam = np.linalg.inv(pose)
        intr = _load_intrinsic(scene_dir, frame)
        hw = _image_hw(img_path)
        uv, visible = project_lidar_to_image(coord, hw, intr, world_to_cam)

        if visible.any():
            # z-buffer occlusion: keep points within z_tolerance of the
            # nearest depth in their pixel. Sort (pixel, depth); the first
            # element of each pixel run is its nearest depth.
            cam_z = (
                np.concatenate([coord, np.ones((coord.shape[0], 1), np.float32)], 1)
                @ world_to_cam.T
            )[:, 2]
            idxs = np.flatnonzero(visible)
            px = uv[idxs, 1].astype(np.int64) * hw[1] + uv[idxs, 0].astype(np.int64)
            z = cam_z[idxs]
            order = np.lexsort((z, px))
            run_head = np.concatenate([[True], px[order][1:] != px[order][:-1]])
            head_pos = np.maximum.accumulate(np.where(run_head, np.arange(order.size), 0))
            nearest_z = z[order][head_pos]
            keep = np.zeros(idxs.size, bool)
            keep[order] = z[order] <= nearest_z + z_tolerance
            idxs = idxs[keep]
        else:
            idxs = np.empty((0,), np.int64)

        if idxs.size:
            corr = np.concatenate(
                [uv[idxs].astype(np.float32), idxs[:, None].astype(np.float32)], axis=1
            )
        else:
            corr = -np.ones((1, 3), np.float32)
        corr_path = os.path.join(out_corr_dir, f"{frame}.npy")
        np.save(corr_path, corr)
        images.append(img_path)
        corrs.append(corr_path)
    return images, corrs


def export(dataset_root, output_root, split="train", max_images=None):
    manifest = {}
    scenes = sorted(
        d for d in glob.glob(os.path.join(dataset_root, "*")) if os.path.isdir(d)
    )
    for scene_dir in scenes:
        if not os.path.exists(os.path.join(scene_dir, "coord.npy")):
            continue
        name = os.path.basename(scene_dir)
        imgs, corrs = scene_correspondences(
            scene_dir, os.path.join(output_root, "correspondence", name), max_images
        )
        manifest[name] = dict(pointclouds=scene_dir, images=imgs, correspondences=corrs)
        print(f"{name}: {len(imgs)} images")
    os.makedirs(os.path.join(output_root, "splits"), exist_ok=True)
    with open(os.path.join(output_root, "splits", f"{split}.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--max_images", type=int, default=None)
    args = parser.parse_args()
    export(args.dataset_root, args.output_root, args.split, args.max_images)


if __name__ == "__main__":
    main()
