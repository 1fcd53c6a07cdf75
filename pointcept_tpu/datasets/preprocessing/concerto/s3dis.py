"""S3DIS (2D-3D-S) image-tree + correspondence export for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/s3dis/
preprocess_s3dis.py` — per room: the point cloud comes from the standard
Annotations/*.txt parser (reused from `preprocessing/s3dis`, with the
reference's optional alignment-angle rotation about the room center); images
come from the 2D-3D-S raw release `<area>/data/{rgb,pose,depth}` where file
names are `camera_<uuid>_<room>_frame_<id>_domain_*`: every `rgb_gap`-th
frame per camera is copied into `images/<area>/<room>/<camera>/color`, the
pose json's `camera_k_matrix` / `camera_rt_matrix` (world-to-cam [3, 4]) are
saved per frame, and per-frame visible-point tables are computed against the
room cloud (reference: open3d mesh raycast + cKDTree; here the point
z-buffer of `common.zbuffer_correspondence` — same table format).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import zbuffer_correspondence
from pointcept_tpu.datasets.preprocessing.s3dis.preprocess_s3dis import process_room


def align_room(coords: np.ndarray, angle_deg: float) -> np.ndarray:
    """Reference alignment: rotate (2 - angle/180)*pi about z at room center."""
    angle = (2 - angle_deg / 180.0) * np.pi
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    center = (coords.max(0) + coords.min(0)) / 2.0
    return (coords - center) @ rot.T + center


def load_alignment_angles(area_dir: str) -> dict:
    """room -> alignment angle from `<Area>_alignmentAngle.txt` (0.0 absent)."""
    out = {}
    for p in glob.glob(os.path.join(area_dir, "*alignmentAngle.txt")):
        with open(p) as f:
            for line in f:
                tok = line.split()
                if len(tok) == 2 and not line.startswith("#"):
                    out[tok[0]] = float(tok[1])
    return out


def export_room_images(
    area: str,
    room: str,
    raw_root: str,
    room_coords: np.ndarray,
    output_root: str,
    rgb_gap: int = 50,
    parse_depths: bool = False,
    corr_tolerance: float = 0.05,
):
    """-> number of exported frames across this room's cameras."""
    area_l = area.lower()
    pat = f"*_{room}_*"
    pose_paths = sorted(
        glob.glob(os.path.join(raw_root, f"{area_l}*", "data", "pose", pat + ".json"))
    )
    rgb_paths = sorted(
        glob.glob(os.path.join(raw_root, f"{area_l}*", "data", "rgb", pat + ".png"))
    )
    depth_paths = sorted(
        glob.glob(os.path.join(raw_root, f"{area_l}*", "data", "depth", pat + ".png"))
    )

    def cam_of(p):
        return os.path.basename(p).split(f"_{room}_")[0].split("camera_")[1]

    cameras = {cam_of(p) for p in pose_paths} & {cam_of(p) for p in rgb_paths}
    save_root = os.path.join(output_root, "images", area, room)
    n_total = 0
    for cam in sorted(cameras):
        cam_pose = [p for p in pose_paths if cam in p]
        cam_rgb = [p for p in rgb_paths if cam in p]
        cam_depth = [p for p in depth_paths if cam in p]
        fids = sorted(
            set(int(re.search(r"frame_(\d+)", p).group(1)) for p in cam_pose)
            & set(int(re.search(r"frame_(\d+)", p).group(1)) for p in cam_rgb)
        )[::rgb_gap]
        if not fids:
            continue

        def with_frame(template, fid):
            pre = template.split("frame_")[0] + "frame_"
            post = "_domain" + template.split("_domain")[1]
            return pre + str(fid) + post

        cam_dir = os.path.join(save_root, cam)
        for sub in ("color", "intrinsic", "pose", "correspondence") + (
            ("depth",) if parse_depths else ()
        ):
            os.makedirs(os.path.join(cam_dir, sub), exist_ok=True)
        from PIL import Image

        with Image.open(with_frame(cam_rgb[0], fids[0])) as im0:
            w, h = im0.size
        for i, fid in enumerate(fids):
            shutil.copy2(with_frame(cam_rgb[0], fid), os.path.join(cam_dir, "color"))
            if parse_depths and cam_depth:
                shutil.copy2(with_frame(cam_depth[0], fid), os.path.join(cam_dir, "depth"))
            with open(with_frame(cam_pose[0], fid)) as f:
                data = json.load(f)
            k = np.asarray(data["camera_k_matrix"], np.float64)
            w2c = np.eye(4)
            w2c[:3, :] = np.asarray(data["camera_rt_matrix"], np.float64)
            np.save(os.path.join(cam_dir, "intrinsic", f"{i}.npy"), k)
            # reference saves the world-to-cam RT (pose consumers invert)
            np.save(os.path.join(cam_dir, "pose", f"{i}.npy"), w2c)
            corr = zbuffer_correspondence(
                room_coords, k, np.linalg.inv(w2c), (h, w), z_tolerance=corr_tolerance
            )
            np.save(os.path.join(cam_dir, "correspondence", f"{i}.npy"), corr)
            n_total += 1
    return n_total


def process_room_full(
    room_dir: str,
    raw_root: str,
    output_root: str,
    rgb_gap: int = 50,
    align_angle: bool = True,
    parse_pointclouds: bool = True,
    parse_depths: bool = False,
):
    area = os.path.basename(os.path.dirname(room_dir))
    room = os.path.basename(room_dir)
    if parse_pointclouds:
        process_room(room_dir, output_root)
    coord_path = os.path.join(output_root, area, room, "coord.npy")
    coords = np.load(coord_path)
    if align_angle:
        angles = load_alignment_angles(os.path.dirname(room_dir))
        if room in angles:
            coords = align_room(coords, angles[room])
            np.save(coord_path, coords.astype(np.float32))
    return export_room_images(
        area, room, raw_root, coords, output_root, rgb_gap, parse_depths
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="Stanford3dDataset aligned tree")
    parser.add_argument("--raw_root", required=True, help="2D-3D-S raw release (area_N/data/...)")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--rgb_gap", type=int, default=50)
    parser.add_argument("--no_align_angle", action="store_true")
    parser.add_argument("--parse_depths", action="store_true")
    args = parser.parse_args()
    rooms = sorted(glob.glob(os.path.join(args.dataset_root, "Area_*", "*")))
    for r in rooms:
        if os.path.isdir(os.path.join(r, "Annotations")):
            n = process_room_full(
                r, args.raw_root, args.output_root, args.rgb_gap,
                align_angle=not args.no_align_angle, parse_depths=args.parse_depths,
            )
            print(f"{r}: {n} frames")


if __name__ == "__main__":
    main()
