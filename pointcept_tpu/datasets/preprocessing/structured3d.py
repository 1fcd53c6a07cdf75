"""Structured3D preprocessing.

Parity: reference `pointcept/datasets/preprocessing/structured3d/
preprocess_structured3d.py` — fuses each room's rendered views (perspective
and/or panorama) into a point cloud with color / normal / semantic labels.
Differences: PIL decodes the PNGs (the reference uses cv2), and scenes are
read from an extracted directory tree rather than zip shards (extract the
zips first; the zip-reader plumbing is I/O glue, the geometry is identical).

Usage:
  python -m pointcept_tpu.datasets.preprocessing.structured3d \
      --dataset_root <Structured3D_extracted> --output_root data/structured3d
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def normal_from_cross_product(points_2d):
    """Per-pixel normals from horizontal x vertical point differences
    (reference :76-85)."""
    hor = np.zeros_like(points_2d)
    ver = np.zeros_like(points_2d)
    hor[:, :-1] = points_2d[:, 1:] - points_2d[:, :-1]
    ver[:-1, :] = points_2d[1:, :] - points_2d[:-1, :]
    n = np.cross(hor, ver)
    d = np.linalg.norm(n, axis=-1, keepdims=True)
    return np.divide(n, d, out=np.zeros_like(n), where=d != 0)


def _read_img(path):
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img)


def parse_perspective_view(view_dir):
    """full/{rgb_rawlight, depth, semantic}.png + camera_pose.txt -> arrays."""
    depth = _read_img(os.path.join(view_dir, "depth.png")).astype(np.float64)
    depth[depth == 0] = 65535
    color = _read_img(os.path.join(view_dir, "rgb_rawlight.png"))[..., :3]
    segment = _read_img(os.path.join(view_dir, "semantic.png")).astype(np.int16)
    cam = np.loadtxt(os.path.join(view_dir, "camera_pose.txt"))
    # camera_pose: vx vy vz tx ty tz ux uy uz xfov yfov 1
    pos = cam[:3]
    t = cam[3:6] / np.linalg.norm(cam[3:6])
    up = cam[6:9] / np.linalg.norm(cam[6:9])
    right = np.cross(t, up)
    h, w = depth.shape
    xfov, yfov = cam[9], cam[10]
    u = (np.arange(w) + 0.5) / w * 2 - 1
    v = (np.arange(h) + 0.5) / h * 2 - 1
    uu, vv = np.meshgrid(u, v)
    dirs = (
        t[None, None, :]
        + uu[..., None] * np.tan(xfov) * right[None, None, :]
        - vv[..., None] * np.tan(yfov) * up[None, None, :]
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # depth is along the view axis
    depth_m = depth / 1000.0
    scale = depth_m / np.maximum((dirs @ t), 1e-6)
    pts = pos[None, None, :] + dirs * scale[..., None]
    normal = normal_from_cross_product(pts)
    ok = depth < 65535
    return pts[ok], color[ok], normal[ok], segment[ok]


def parse_panorama_view(room_dir):
    """panorama/full/{rgb_rawlight, depth, semantic}.png + camera_xyz.txt."""
    full = os.path.join(room_dir, "panorama", "full")
    depth = _read_img(os.path.join(full, "depth.png")).astype(np.float64)
    depth[depth == 0] = 65535
    color = _read_img(os.path.join(full, "rgb_rawlight.png"))[..., :3]
    segment = _read_img(os.path.join(full, "semantic.png")).astype(np.int16)
    pos = np.loadtxt(os.path.join(room_dir, "panorama", "camera_xyz.txt")) / 1000.0
    h, w = depth.shape
    theta = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi  # azimuth
    phi = (np.arange(h) + 0.5) / h * np.pi - np.pi / 2  # elevation
    tt, pp = np.meshgrid(theta, phi)
    dirs = np.stack(
        [np.cos(pp) * np.sin(tt), np.cos(pp) * np.cos(tt), -np.sin(pp)], axis=-1
    )
    pts = pos[None, None, :] + dirs * (depth / 1000.0)[..., None]
    normal = normal_from_cross_product(pts)
    ok = depth < 65535
    return pts[ok], color[ok], normal[ok], segment[ok]


def parse_scene(scene_dir, output_root, grid_size=None, fuse_prsp=True, fuse_pano=True):
    scene_dir = Path(scene_dir)
    scene = scene_dir.name
    rooms = sorted(os.listdir(scene_dir / "2D_rendering"))
    for room in rooms:
        room_dir = scene_dir / "2D_rendering" / room
        pts_l, col_l, nrm_l, seg_l = [], [], [], []
        if fuse_prsp and (room_dir / "perspective" / "full").is_dir():
            for view in sorted(os.listdir(room_dir / "perspective" / "full")):
                vd = room_dir / "perspective" / "full" / view
                if not (vd / "depth.png").is_file():
                    continue
                p, c, n, s = parse_perspective_view(str(vd))
                pts_l.append(p), col_l.append(c), nrm_l.append(n), seg_l.append(s)
        if fuse_pano and (room_dir / "panorama").is_dir():
            p, c, n, s = parse_panorama_view(str(room_dir))
            pts_l.append(p), col_l.append(c), nrm_l.append(n), seg_l.append(s)
        if not pts_l:
            continue
        coord = np.concatenate(pts_l).astype(np.float32)
        color = np.concatenate(col_l).astype(np.uint8)
        normal = np.concatenate(nrm_l).astype(np.float32)
        segment = np.concatenate(seg_l).astype(np.int16)
        out = Path(output_root) / f"{scene}_room_{room}"
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "coord.npy", coord)
        np.save(out / "color.npy", color)
        np.save(out / "normal.npy", normal)
        np.save(out / "segment.npy", segment)
        print(f"{scene}/{room}: {coord.shape[0]} pts -> {out}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--no_prsp", action="store_true")
    parser.add_argument("--no_pano", action="store_true")
    args = parser.parse_args()
    root = Path(args.dataset_root) / "Structured3D"
    scenes = sorted(os.listdir(root))
    for i, scene in enumerate(scenes):
        # official split: first 3000 scenes train, 3000-3249 val, 3250+ test
        sid = int(scene.split("_")[-1])
        split = "train" if sid < 3000 else ("val" if sid < 3250 else "test")
        parse_scene(
            root / scene,
            Path(args.output_root) / split,
            fuse_prsp=not args.no_prsp,
            fuse_pano=not args.no_pano,
        )


if __name__ == "__main__":
    main()
