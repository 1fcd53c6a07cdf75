"""Cap3D view-correspondence export for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/cap3d/
preprocess_cap3d.py` — for each object: up to NUM_VIEWS rendered views
(16-bit depth PNGs, 65535 = invalid, scaled to MAX_DEPTH) with JSON camera
params (x/y/z axis vectors + origin, x_fov/y_fov) are unprojected to world
points and matched to the object's GT point cloud via a 1 cm nearest-neighbor
query; correspondences `[pixel_x, pixel_y, point_index]` are saved per view
as `<output>/<name>/<view>.npy` (-ones when nothing matches).
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import zipfile
from pathlib import Path

import numpy as np

NUM_VIEWS = 4
MAX_DEPTH = 5.0


def recover_depth(depth_png: str, max_depth: float = MAX_DEPTH):
    from PIL import Image

    with Image.open(depth_png) as im:
        d16 = np.array(im)
    invalid = d16 == 65535
    return d16.astype(np.float32) / 65535.0 * max_depth, invalid


def load_cam_params(path: str, width: int, height: int):
    """Blender-style axis-vector camera json -> (cam_to_world [4,4], K [3,3])."""
    with open(path) as f:
        data = json.load(f)
    rt = np.eye(4)
    rt[:3, :3] = np.array([data["x"], data["y"], data["z"]]).T
    rt[:3, 3] = np.asarray(data["origin"])
    fx = (width / 2.0) / math.tan(data["x_fov"] / 2.0)
    fy = (height / 2.0) / math.tan(data["y_fov"] / 2.0)
    k = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1.0]])
    return rt, k


def view_correspondence(depth, invalid, cam_to_world, k, coords_gt, tol=0.01):
    """[M, 3] (px, py, gt_index) of pixels whose unprojection lands within
    `tol` of a GT point; -ones((1,3)) when none do."""
    from scipy.spatial import cKDTree

    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(w * h)], axis=1).astype(np.float64)
    d = depth.ravel()
    valid = ~(np.isinf(d) | invalid.ravel())
    if not valid.any():
        return -np.ones((1, 3))
    cam = d[valid, None] * (np.linalg.inv(k) @ pix[valid].T).T
    world = cam @ cam_to_world[:3, :3].T + cam_to_world[:3, 3]
    dis, idx = cKDTree(coords_gt).query(world, k=1)
    keep = dis < tol
    if not keep.any():
        return -np.ones((1, 3))
    return np.hstack([pix[valid][keep][:, :2], idx[keep, None].astype(np.float64)])


def _select_views(paths, num_views=NUM_VIEWS):
    paths = sorted(paths)
    if len(paths) >= num_views:
        return paths[:: len(paths) // num_views]
    return paths


def process_object(pt_path: str, cam_root: str, output_root: str):
    """One object: GT cloud (.pt/.npy) + rendered views -> correspondences."""
    name = Path(pt_path).stem
    cam_dir = os.path.join(cam_root, name)
    cam_zip = cam_dir + ".zip"
    if not os.path.isdir(cam_dir):
        if not os.path.exists(cam_zip):
            return None
        with zipfile.ZipFile(cam_zip) as z:
            z.extractall(cam_dir)
    if pt_path.endswith(".npy"):
        cloud = np.load(pt_path)
    else:
        import torch

        t = torch.load(pt_path, map_location="cpu")
        cloud = t.numpy() if hasattr(t, "numpy") else np.asarray(t)
    cloud = cloud[:3, :].T  # reference layout: [6, N] xyzrgb rows

    depth_paths = _select_views(glob.glob(os.path.join(cam_dir, "*_depth.png")))
    cam_paths = [
        p for p in glob.glob(os.path.join(cam_dir, "*.json"))
        if os.path.basename(p) not in ("transforms_train.json", "info.json")
    ]
    cam_paths = _select_views(cam_paths)
    by_depth = {os.path.basename(p)[: -len("_depth.png")]: p for p in depth_paths}
    by_cam = {os.path.basename(p)[: -len(".json")]: p for p in cam_paths}
    out_dir = os.path.join(output_root, name)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for vid in sorted(set(by_depth) & set(by_cam)):
        depth, invalid = recover_depth(by_depth[vid])
        h, w = depth.shape
        rt, k = load_cam_params(by_cam[vid], w, h)
        corr = view_correspondence(depth, invalid, rt, k, cloud)
        np.save(os.path.join(out_dir, f"{vid}.npy"), corr)
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cam_root", required=True)
    parser.add_argument("--point_cloud_root", required=True)
    parser.add_argument("--output_root", required=True)
    args = parser.parse_args()
    os.makedirs(args.output_root, exist_ok=True)
    pts = sorted(
        glob.glob(os.path.join(args.point_cloud_root, "**", "*.pt"), recursive=True)
        + glob.glob(os.path.join(args.point_cloud_root, "**", "*.npy"), recursive=True)
    )
    for p in pts:
        n = process_object(p, args.cam_root, args.output_root)
        print(f"{Path(p).stem}: {n} views")


if __name__ == "__main__":
    main()
