"""ARKitScenes image-tree + correspondence export for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/
arkitscenes/{preprocess_arkitscenes,rotation}.py` — per scene:
`<scene>/<id>_frames/lowres_wide/*.png` RGB frames every `frame_gap`-th,
`.pincam` intrinsics (w h fx fy cx cy), the `lowres_wide.traj`
angle-axis+translation world-to-camera trajectory (pose = inverse, matched
to each frame by nearest timestamp at 3 decimals), optional lowres depth,
the `<id>_3dod_mesh.ply` vertices/colors (+ accumulated-face-normal vertex
normals) as the point cloud, and per-frame visible-point correspondence
tables (reference: camtools mesh raycast + 1 cm cKDTree snap; here the
point z-buffer of `common.zbuffer_correspondence` — same table format).
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import zbuffer_correspondence
from pointcept_tpu.datasets.preprocessing.hm3d import _vertex_normals
from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply


def angle_axis_to_matrix(v: np.ndarray) -> np.ndarray:
    """Rodrigues: rotation vector (radians, axis*angle) -> [3, 3]."""
    theta = float(np.linalg.norm(v))
    if theta < 1e-12:
        return np.eye(3)
    k = v / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def traj_to_poses(traj_path: str) -> dict:
    """timestamp('%.3f') -> cam_to_world [4, 4] (traj rows are world-to-cam)."""
    poses = {}
    with open(traj_path) as f:
        for line in f:
            tok = line.split()
            if len(tok) != 7:
                continue
            w2c = np.eye(4)
            w2c[:3, :3] = angle_axis_to_matrix(np.asarray([float(x) for x in tok[1:4]]))
            w2c[:3, 3] = [float(x) for x in tok[4:7]]
            poses[f"{round(float(tok[0]), 3):.3f}"] = np.linalg.inv(w2c)
    return poses


def read_pincam(path: str) -> np.ndarray:
    w, h, fx, fy, cx, cy = np.loadtxt(path)
    return np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def process_scene(
    scene_path: str,
    output_path: str,
    frame_gap: int = 10,
    parse_pointclouds: bool = True,
    parse_depths: bool = False,
    corr_tolerance: float = 0.05,
):
    split = os.path.basename(os.path.dirname(scene_path))
    scene_id = os.path.basename(scene_path)
    frames = os.path.join(scene_path, f"{scene_id}_frames")
    img_folder = os.path.join(frames, "lowres_wide")
    im_out = os.path.join(output_path, "images", split, scene_id)
    os.makedirs(im_out, exist_ok=True)
    images = sorted(
        glob.glob(os.path.join(img_folder, "*.png")),
        key=lambda x: float(os.path.basename(x).split("_")[1][:-4]),
    )
    video_id = scene_id
    frame_ids = sorted(os.path.basename(x)[:-4].split("_")[1] for x in images)[::frame_gap]
    if not frame_ids:
        return 0

    poses = traj_to_poses(os.path.join(frames, "lowres_wide.traj"))
    keys = list(poses)
    for sub in ("intrinsic", "pose", "color") + (("depth",) if parse_depths else ()):
        os.makedirs(os.path.join(im_out, sub), exist_ok=True)
    ks, ts = [], []
    for fid in frame_ids:
        shutil.copy(
            os.path.join(img_folder, f"{video_id}_{fid}.png"),
            os.path.join(im_out, "color"),
        )
        if parse_depths:
            shutil.copy(
                os.path.join(frames, "lowres_depth", f"{video_id}_{fid}.png"),
                os.path.join(im_out, "depth"),
            )
        k = read_pincam(
            os.path.join(frames, "lowres_wide_intrinsics", f"{video_id}_{fid}.pincam")
        )
        np.save(os.path.join(im_out, "intrinsic", f"{video_id}_{fid}.npy"), k)
        fid3 = f"{round(float(fid), 3):.3f}"
        closest = min(keys, key=lambda x: abs(float(x) - float(fid3)))
        np.save(os.path.join(im_out, "pose", f"{video_id}_{fid3}.npy"), poses[closest])
        ks.append(k)
        ts.append(poses[closest])

    ply_path = os.path.join(scene_path, f"{scene_id}_3dod_mesh.ply")
    coords, colors, _, faces = read_scene_ply(ply_path)
    if parse_pointclouds:
        if colors is None:
            colors = np.zeros_like(coords)
        normals = (
            _vertex_normals(coords.astype(np.float64), faces)
            if faces is not None
            else np.zeros_like(coords)
        )
        pc_out = os.path.join(output_path, split, scene_id)
        os.makedirs(pc_out, exist_ok=True)
        np.save(os.path.join(pc_out, "coord.npy"), coords)
        np.save(os.path.join(pc_out, "color.npy"), colors)
        np.save(os.path.join(pc_out, "normal.npy"), normals.astype(np.float32))

    corr_dir = os.path.join(im_out, "correspondence")
    os.makedirs(corr_dir, exist_ok=True)
    from PIL import Image

    with Image.open(images[0]) as im0:
        w, h = im0.size
    for fid, k, pose in zip(frame_ids, ks, ts):
        corr = zbuffer_correspondence(coords, k, pose, (h, w), z_tolerance=corr_tolerance)
        fid3 = f"{round(float(fid), 3):.3f}"
        np.save(os.path.join(corr_dir, f"{fid3}.npy"), corr)
    return len(frame_ids)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="root with 3dod/<split>/<scene>")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--frame_gap", type=int, default=10)
    parser.add_argument("--parse_depths", action="store_true")
    args = parser.parse_args()
    scenes = sorted(glob.glob(os.path.join(args.dataset_root, "3dod", "*", "*")))
    for s in scenes:
        if os.path.isdir(s):
            n = process_scene(
                s, args.output_root, args.frame_gap, parse_depths=args.parse_depths
            )
            print(f"{os.path.basename(s)}: {n} frames")


if __name__ == "__main__":
    main()
