"""Concerto Structured3D exporter: fused rooms + posed frames + correspondences.

Parity: reference `concerto/structured3d/preprocess_structured3d.py` — fuses
each room's perspective + panorama renders into a 25-class point cloud while
tracking every fused point's source (pixel_x, pixel_y, frame) so the exported
correspondence tables are exact (frame -1 = the panorama). Per room it writes

    <out>/<split>/<scene>/room_<r>/{coord,color,normal,segment}.npy
    <out>/images/<split>/<scene>/room_<r>/color/{prsp,pano}/<i>.png
    .../pose/<i>.npy  .../intrinsic/<i>.npy
    .../correspondence/{prsp,pano}_correspondence/<i>.npy

Geometry reuses the base preprocessor (`preprocessing/structured3d.py`);
this module adds the correspondence tracking, per-frame K/T export (pinhole K
from the view fovs, pose from the camera basis), the y/z axis swap to z-up,
and optional grid sampling that keeps one source pixel per voxel (reference
:405-460).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import save_image
from pointcept_tpu.datasets.preprocessing.structured3d import (
    _read_img,
    normal_from_cross_product,
)

# NYU40 ids kept by Structured3D's 25-class benchmark (reference :17-45);
# everything else maps to ignore_index
VALID_CLASS_IDS_25 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 14, 15, 16, 17, 18, 19, 22, 24, 25,
    32, 34, 35, 38, 39, 40,
)
# fused rooms keep only frames/rooms with something besides these
_STRUCTURAL = (-1, 0, 1, 16)  # ignore, wall, floor, ceiling (25-class ids)
_SWAP_YZ = np.array([[1.0, 0, 0], [0, 0, 1], [0, 1, 0]])


def _parse_prsp_grid(view_dir):
    """One perspective view as [H, W] grids + camera (K, T) in room frame."""
    depth = _read_img(os.path.join(view_dir, "depth.png")).astype(np.float64)
    depth[depth == 0] = 65535
    color = _read_img(os.path.join(view_dir, "rgb_rawlight.png"))[..., :3]
    segment = _read_img(os.path.join(view_dir, "semantic.png")).astype(np.int16)
    cam = np.loadtxt(os.path.join(view_dir, "camera_pose.txt"))
    pos = cam[:3] / 1000.0
    front = cam[3:6] / np.linalg.norm(cam[3:6])
    up = cam[6:9] / np.linalg.norm(cam[6:9])
    right = np.cross(front, up)
    xfov, yfov = cam[9], cam[10]
    h, w = depth.shape

    # pinhole K from the fovs (reference :236-244: cx = W/2, fx = cx/tan(xfov))
    K = np.eye(3)
    K[0, 2], K[1, 2] = w / 2.0, h / 2.0
    K[0, 0], K[1, 1] = K[0, 2] / np.tan(xfov), K[1, 2] / np.tan(yfov)
    # camera basis: +x right, +y down (-up), +z forward
    R = np.stack([right, -up, front], axis=1)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, pos

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).astype(np.float64)
    rays_cam = pix @ np.linalg.inv(K).T
    pts = (rays_cam * (depth / 1000.0)[..., None]) @ R.T + pos
    normal = normal_from_cross_product(pts)

    # grazing-angle filter (reference :252-262): drop pixels whose normal is
    # near-perpendicular to the view ray
    view = pts - pos
    vd = np.maximum(np.linalg.norm(view, axis=-1), 1e-4)
    cos = np.abs((view * normal).sum(-1) / vd)
    ok = (cos > 0.15) & (depth < 65535) & (segment > 0)
    return pts, color, normal, segment, ok, K, T


def _parse_pano_grid(room_dir):
    full = os.path.join(room_dir, "panorama", "full")
    depth = _read_img(os.path.join(full, "depth.png")).astype(np.float64)
    depth[depth == 0] = 65535
    color = _read_img(os.path.join(full, "rgb_rawlight.png"))[..., :3]
    segment = _read_img(os.path.join(full, "semantic.png")).astype(np.int16)
    pos = np.loadtxt(os.path.join(room_dir, "panorama", "camera_xyz.txt")) / 1000.0
    h, w = depth.shape
    theta = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi
    phi = (np.arange(h) + 0.5) / h * np.pi - np.pi / 2
    tt, pp = np.meshgrid(theta, phi)
    dirs = np.stack(
        [np.cos(pp) * np.sin(tt), np.cos(pp) * np.cos(tt), -np.sin(pp)], axis=-1
    )
    pts = pos + dirs * (depth / 1000.0)[..., None]
    normal = normal_from_cross_product(pts)
    view = pts - pos
    vd = np.maximum(np.linalg.norm(view, axis=-1), 1e-4)
    cos = np.abs((view * normal).sum(-1) / vd)
    ok = (cos > 0.15) & (depth < 65535) & (segment > 0)
    return pts, color, normal, segment, ok


def parse_room(
    room_dir,
    pc_dir,
    im_dir,
    ignore_index=-1,
    grid_size=None,
    fuse_prsp=True,
    fuse_pano=True,
    parse_depths=False,
):
    """Fuse + export one room. Returns point count (0 = skipped)."""
    room_dir = Path(room_dir)
    pts_l, col_l, nrm_l, seg_l, pix_l = [], [], [], [], []
    prsp_imgs, prsp_depths, Ks, Ts = [], [], [], []
    pano_img = None
    if fuse_prsp and (room_dir / "perspective" / "full").is_dir():
        for view in sorted(os.listdir(room_dir / "perspective" / "full")):
            vd = room_dir / "perspective" / "full" / view
            if not (vd / "depth.png").is_file():
                continue
            pts, color, normal, segment, ok, K, T = _parse_prsp_grid(str(vd))
            if not ok.any():
                continue
            frame_id = len(prsp_imgs)
            h, w = ok.shape
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            pix = np.stack([xs[ok], ys[ok], np.full(ok.sum(), frame_id)], 1)
            pts_l.append(pts[ok]), col_l.append(color[ok])
            nrm_l.append(normal[ok]), seg_l.append(segment[ok]), pix_l.append(pix)
            prsp_imgs.append(color)
            if parse_depths:
                prsp_depths.append(
                    np.where(ok, (np.linalg.norm(pts - T[:3, 3], axis=-1) * 1000), 0).astype(np.uint16)
                )
            Ks.append(K), Ts.append(T)
    if fuse_pano and (room_dir / "panorama").is_dir():
        pts, color, normal, segment, ok = _parse_pano_grid(str(room_dir))
        if ok.any():
            h, w = ok.shape
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            pix = np.stack([xs[ok], ys[ok], np.full(ok.sum(), -1)], 1)
            pts_l.append(pts[ok]), col_l.append(color[ok])
            nrm_l.append(normal[ok]), seg_l.append(segment[ok]), pix_l.append(pix)
            pano_img = color
    if not pts_l:
        return 0

    coord = np.concatenate(pts_l) @ _SWAP_YZ
    color = np.concatenate(col_l)
    normal = np.concatenate(nrm_l) @ _SWAP_YZ
    seg_raw = np.concatenate(seg_l)
    pixel = np.concatenate(pix_l)
    segment = np.full(seg_raw.shape, ignore_index, np.int16)
    for new_id, nyu_id in enumerate(VALID_CLASS_IDS_25):
        segment[seg_raw == nyu_id] = new_id
    if not np.isin(segment, _STRUCTURAL, invert=True).any():
        return 0  # nothing but wall/floor/ceiling (reference :385-391)

    if grid_size is not None:
        keep = np.unique(np.floor(coord / grid_size).astype(int), axis=0, return_index=True)[1]
        coord, color, normal, segment, pixel = (
            coord[keep], color[keep], normal[keep], segment[keep], pixel[keep],
        )

    os.makedirs(pc_dir, exist_ok=True)
    np.save(os.path.join(pc_dir, "coord.npy"), coord.astype(np.float32))
    np.save(os.path.join(pc_dir, "color.npy"), color.astype(np.uint8))
    np.save(os.path.join(pc_dir, "normal.npy"), normal.astype(np.float32))
    np.save(os.path.join(pc_dir, "segment.npy"), segment.astype(np.int16))

    # per-frame correspondence tables: (x, y, fused point index)
    point_ids = np.arange(coord.shape[0])
    swap4 = np.eye(4)
    swap4[:3, :3] = _SWAP_YZ
    if prsp_imgs:
        for sub in ("color/prsp", "correspondence/prsp_correspondence", "pose", "intrinsic"):
            os.makedirs(os.path.join(im_dir, sub), exist_ok=True)
        if parse_depths:
            os.makedirs(os.path.join(im_dir, "depth", "prsp"), exist_ok=True)
        for i, img in enumerate(prsp_imgs):
            save_image(os.path.join(im_dir, "color", "prsp", f"{i}.png"), img)
            if parse_depths:
                save_image(os.path.join(im_dir, "depth", "prsp", f"{i}.png"), prsp_depths[i])
            sel = pixel[:, 2] == i
            corr = (
                np.concatenate([pixel[sel][:, :2], point_ids[sel][:, None]], 1).astype(np.int32)
                if sel.any()
                else -np.ones((1, 3), np.int32)
            )
            np.save(os.path.join(im_dir, "correspondence", "prsp_correspondence", f"{i}.npy"), corr)
            np.save(os.path.join(im_dir, "intrinsic", f"{i}.npy"), Ks[i].astype(np.float32))
            # pose in the exported (z-up) frame, like the reference's Ts @ swap
            np.save(os.path.join(im_dir, "pose", f"{i}.npy"), (swap4 @ Ts[i]).astype(np.float32))
    if pano_img is not None:
        os.makedirs(os.path.join(im_dir, "color", "pano"), exist_ok=True)
        os.makedirs(os.path.join(im_dir, "correspondence", "pano_correspondence"), exist_ok=True)
        save_image(os.path.join(im_dir, "color", "pano", "0.png"), pano_img)
        sel = pixel[:, 2] == -1
        corr = (
            np.concatenate([pixel[sel][:, :2], point_ids[sel][:, None]], 1).astype(np.int32)
            if sel.any()
            else -np.ones((1, 3), np.int32)
        )
        np.save(os.path.join(im_dir, "correspondence", "pano_correspondence", "0.npy"), corr)
    return int(coord.shape[0])


def split_of(scene_name):
    sid = int(scene_name.split("_")[-1])
    return "train" if sid < 3000 else ("val" if sid < 3250 else "test")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="extracted Structured3D/")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--grid_size", type=float, default=None)
    parser.add_argument("--no_prsp", action="store_true")
    parser.add_argument("--no_pano", action="store_true")
    parser.add_argument("--parse_depths", action="store_true")
    args = parser.parse_args()
    root = Path(args.dataset_root) / "Structured3D"
    for scene in sorted(os.listdir(root)):
        split = split_of(scene)
        rendering = root / scene / "2D_rendering"
        if not rendering.is_dir():
            continue
        for room in sorted(os.listdir(rendering)):
            n = parse_room(
                rendering / room,
                os.path.join(args.output_root, split, scene, f"room_{room}"),
                os.path.join(args.output_root, "images", split, scene, f"room_{room}"),
                grid_size=args.grid_size,
                fuse_prsp=not args.no_prsp,
                fuse_pano=not args.no_pano,
                parse_depths=args.parse_depths,
            )
            print(f"{scene}/room_{room}: {n} pts")


if __name__ == "__main__":
    main()
