"""ScanNet++ DSLR image-tree + correspondence export for Concerto.

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/scannetpp/
preprocess_scannetpp.py` — per scene: the point cloud/labels come from the
standard mesh + segments_anno parser (reused from `preprocessing/scannetpp`);
the DSLR COLMAP text model (`cameras.txt` OPENCV/OPENCV_FISHEYE intrinsics +
distortion, `images.txt` qw-qx-qy-qz-t world-to-cam rows) is parsed directly,
intrinsics are rectified to the undistorted-image camera (cv2
getOptimalNewCameraMatrix / fisheye.estimateNewCameraMatrixForUndistortRectify,
COLMAP 0.5-pixel-center convention preserved), every `frame_gap`-th
undistorted JPG is exported with per-frame `intrinsic/pose` npys, and
visible-point tables are computed against the scene cloud (reference: mesh
raycast + cKDTree; here `common.zbuffer_correspondence` — same format).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import zbuffer_correspondence

REGEXPR_DSLR = re.compile(r"^DSC(?P<frameid>\d+).JPG$")


def pose_from_qwxyz_txyz(elems):
    """COLMAP image row (qw qx qy qz tx ty tz, world-to-cam) -> cam_to_world."""
    from scipy.spatial.transform import Rotation

    qw, qx, qy, qz, tx, ty, tz = map(float, elems)
    w2c = np.eye(4)
    w2c[:3, :3] = Rotation.from_quat((qx, qy, qz, qw)).as_matrix()
    w2c[:3, 3] = (tx, ty, tz)
    return np.linalg.inv(w2c)


def undistort_intrinsics(cam_row):
    """COLMAP cameras.txt row -> (width, height, new_K for the undistorted
    images). Mirrors the reference's cv2 rectification incl. the COLMAP
    half-pixel center convention."""
    import cv2

    cam_type = cam_row[0]
    width, height = int(cam_row[1]), int(cam_row[2])
    fx, fy, cx, cy = (float(x) for x in cam_row[3:7])
    dist = np.asarray([float(x) for x in cam_row[7:]])
    k = np.array([[fx, 0, cx - 0.5], [0, fy, cy - 0.5], [0, 0, 1.0]])
    if cam_type == "OPENCV_FISHEYE":
        new_k = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            k, dist[:4], (width, height), np.eye(3), balance=0.0
        )
        new_k[0, 2] = width / 2.0
        new_k[1, 2] = height / 2.0
    elif dist.size and np.abs(dist).max() > 0:
        new_k, _ = cv2.getOptimalNewCameraMatrix(
            k, dist, (width, height), 1, (width, height), True
        )
    else:
        new_k = k.copy()
    new_k = new_k.copy()
    new_k[0, 2] += 0.5
    new_k[1, 2] += 0.5
    return width, height, new_k


def load_sfm(sfm_dir: str):
    """-> (name->idx, idx->dict(intrinsics, cam_to_world, frame_id, w, h))."""
    with open(os.path.join(sfm_dir, "cameras.txt")) as f:
        raw = [l for l in f.read().splitlines() if l and not l.startswith("#")]
    cam_row = raw[0].split(" ")[1:]
    w, h, new_k = undistort_intrinsics(cam_row)
    with open(os.path.join(sfm_dir, "images.txt")) as f:
        rows = [l for l in f.read().splitlines() if l and not l.startswith("#")]
    img_idx, img_infos = {}, {}
    for image_row in rows[0::2]:
        tok = image_row.split(" ")
        idx, img_name = tok[0], tok[-1]
        m = REGEXPR_DSLR.match(img_name)
        img_idx[img_name] = idx
        img_infos[idx] = dict(
            intrinsics=new_k,
            cam_to_world=pose_from_qwxyz_txyz(tok[1:8]),
            frame_id=m["frameid"] if m else img_name,
            width=w,
            height=h,
        )
    return img_idx, img_infos


def export_scene_images(
    scene_path: str,
    name: str,
    coord: np.ndarray,
    im_output_root: str,
    frame_gap: int = 20,
    corr_tolerance: float = 0.05,
):
    img_idx, img_infos = load_sfm(os.path.join(scene_path, "dslr", "colmap"))
    rgb = sorted(
        glob.glob(os.path.join(scene_path, "dslr", "undistorted_images", "*.JPG")),
        key=lambda x: int(os.path.basename(x)[3:-4]),
    )[::frame_gap]
    out = os.path.join(im_output_root, name)
    for sub in ("color", "intrinsic", "pose", "correspondence"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    n = 0
    for i, p in enumerate(rgb):
        info = img_infos.get(img_idx.get(os.path.basename(p)))
        if info is None:
            continue
        shutil.copy(p, os.path.join(out, "color"))
        np.save(os.path.join(out, "intrinsic", f"{i}.npy"), info["intrinsics"])
        np.save(os.path.join(out, "pose", f"{i}.npy"), info["cam_to_world"])
        corr = zbuffer_correspondence(
            coord, info["intrinsics"], info["cam_to_world"],
            (info["height"], info["width"]), z_tolerance=corr_tolerance,
        )
        np.save(os.path.join(out, "correspondence", f"{i}.npy"), corr)
        n += 1
    return n


def process_scene(
    scene_path: str,
    split: str,
    output_root: str,
    class2idx=None,
    frame_gap: int = 20,
    parse_pointclouds: bool = True,
):
    from pointcept_tpu.datasets.preprocessing.scannetpp import parse_scene

    name = os.path.basename(scene_path)
    pc_out = os.path.join(output_root, split)
    if parse_pointclouds:
        parse_scene(scene_path, os.path.join(pc_out, name), class2idx or {})
    coord = np.load(os.path.join(pc_out, name, "coord.npy"))
    return export_scene_images(
        scene_path, name, coord, os.path.join(output_root, "images", split), frame_gap
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="scannetpp root (data/<scene>)")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--frame_gap", type=int, default=20)
    args = parser.parse_args()
    scenes = sorted(glob.glob(os.path.join(args.dataset_root, "data", "*")))
    for s in scenes:
        if os.path.isdir(s):
            n = process_scene(s, args.split, args.output_root, frame_gap=args.frame_gap)
            print(f"{os.path.basename(s)}: {n} frames")


if __name__ == "__main__":
    main()
