"""Waymo image-tree + LiDAR-correspondence export for Concerto (SDK-gated).

Parity: `/root/reference/pointcept/datasets/preprocessing/concerto/waymo/
preprocess_waymo.py` — per labeled frame of each TFRecord segment: LiDAR
coord/strength/pose/segment (as the base Waymo export) plus per-point normals
(kNN-PCA, flipped toward the LiDAR origin), each camera's JPG with its
intrinsic/ego-extrinsic, per-camera `correspondence/<cam>.npy`
[pixel_x, pixel_y, point_index] tables, and the per-point color painted from
the first camera (FRONT-first order) that sees it.

The TFRecord/proto walk and the rolling-shutter camera projection need the
`waymo_open_dataset` SDK (not in this image): `parse_segment` imports it
lazily like `preprocessing/waymo.py`. The numpy pieces — `estimate_normals`
(reference: open3d estimate_normals + view-direction flip) and
`project_points_pinhole` (the global-shutter fallback the reference's
`project_vehicle_to_image` reduces to for static scenes) — are testable
without it.
"""

from __future__ import annotations

import argparse
import glob
import io
import os
from pathlib import Path

import numpy as np

CAM_ORDER = ["FRONT", "SIDE_RIGHT", "SIDE_LEFT", "FRONT_RIGHT", "FRONT_LEFT"]


def estimate_normals(coords: np.ndarray, cam_center, k: int = 16) -> np.ndarray:
    """kNN-PCA normals flipped to face `cam_center` (reference: open3d
    `estimate_normals` + view-dir flip, preprocess_waymo.py:78-93)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    _, nbrs = tree.query(coords, k=min(k, len(coords)))
    pts = coords[nbrs]  # [N, k, 3]
    centered = pts - pts.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]  # smallest-eigenvalue direction
    view = coords - np.asarray(cam_center).reshape(1, 3)
    view /= np.maximum(np.linalg.norm(view, axis=1, keepdims=True), 1e-12)
    flip = np.sum(normals * view, axis=1) > 0
    normals[flip] = -normals[flip]
    return normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)


def project_points_pinhole(coord_ego, cam2ego, intrinsic, hw):
    """Ego-frame points -> (uv, depth, inside) for one camera.

    Waymo camera frame: +x forward, +y left, +z up; image x right, y down —
    the axis permutation below maps to the OpenCV convention before the
    pinhole projection. Global-shutter approximation of the reference's
    `py_camera_model_ops.world_to_image` (exact for static scenes)."""
    ego2cam = np.linalg.inv(cam2ego)
    cam = coord_ego @ ego2cam[:3, :3].T + ego2cam[:3, 3]
    # waymo cam -> opencv cam: x_cv = -y_w, y_cv = -z_w, z_cv = x_w
    cv = np.stack([-cam[:, 1], -cam[:, 2], cam[:, 0]], axis=1)
    z = cv[:, 2]
    safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
    uvw = cv @ np.asarray(intrinsic, np.float64).T
    uv = uvw[:, :2] / safe[:, None]
    h, w = hw
    pix = np.round(uv)
    inside = (z > 1e-6) & (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
    return uv, z, inside


def camera_correspondence(coord_ego, cam2ego, intrinsic, image_hw):
    """[M, 3] (px, py, point_idx) of points inside this camera's image."""
    uv, _, inside = project_points_pinhole(coord_ego, cam2ego, intrinsic, image_hw)
    idx = np.flatnonzero(inside)
    if idx.size == 0:
        return -np.ones((1, 3), np.float32)
    return np.concatenate(
        [uv[idx].astype(np.float32), idx[:, None].astype(np.float32)], axis=1
    )


def paint_colors(color, painted, coord_ego, cam2ego, intrinsic, image):
    """Paint un-painted points visible in `image`; returns updated mask."""
    h, w = image.shape[:2]
    uv, _, inside = project_points_pinhole(coord_ego, cam2ego, intrinsic, (h, w))
    sel = inside & ~painted
    pix = np.round(uv[sel]).astype(np.int64)
    color[sel] = image[np.clip(pix[:, 1], 0, h - 1), np.clip(pix[:, 0], 0, w - 1)]
    painted = painted | inside
    return painted


def parse_segment(tf_path: str, output_root: str, test_frame_list=()):
    """Full SDK path: mirrors reference handle_process (labeled frames only)."""
    import tensorflow as tf
    from PIL import Image
    from waymo_open_dataset import dataset_pb2 as open_dataset

    from pointcept_tpu.datasets.preprocessing.waymo import frame_points_and_labels

    split = os.path.basename(os.path.dirname(tf_path))
    seg_name = os.path.basename(tf_path).split(".")[0]
    save_root = Path(output_root) / split / seg_name
    n = 0
    for data in tf.data.TFRecordDataset(tf_path, compression_type=""):
        frame = open_dataset.Frame()
        frame.ParseFromString(bytes(data.numpy()))
        ts = str(frame.timestamp_micros)
        if split != "testing":
            if not frame.lasers[0].ri_return1.segmentation_label_compressed:
                continue
        elif f"{frame.context.name},{ts}" not in test_frame_list:
            continue
        coord, strength, label = frame_points_and_labels(frame)
        pose = np.array(frame.pose.transform, np.float32).reshape(4, 4)
        out = save_root / ts
        os.makedirs(out, exist_ok=True)
        np.save(out / "coord.npy", coord)
        # frame_points_and_labels already applies the official tanh squash
        np.save(out / "strength.npy", strength.reshape(-1, 1))
        np.save(out / "pose.npy", pose)
        np.save(out / "normal.npy", estimate_normals(coord, np.zeros(3)))
        if split != "testing" and label is not None:
            np.save(out / "segment.npy", label)

        img_root = Path(output_root) / "images" / split / seg_name / ts
        for sub in ("color", "correspondence", "intrinsic", "pose"):
            os.makedirs(img_root / sub, exist_ok=True)
        images = {}
        for image in frame.images:
            cam = open_dataset.CameraName.Name.Name(image.name)
            images[cam] = np.array(Image.open(io.BytesIO(image.image)))
            with open(img_root / "color" / f"{cam}.jpg", "wb") as f:
                f.write(image.image)
        color = np.zeros((coord.shape[0], 3))
        painted = np.zeros(coord.shape[0], bool)
        order = {name: i for i, name in enumerate(CAM_ORDER)}
        calibs = sorted(
            frame.context.camera_calibrations,
            key=lambda c: order.get(open_dataset.CameraName.Name.Name(c.name), 999),
        )
        for c in calibs:
            cam = open_dataset.CameraName.Name.Name(c.name)
            cam2ego = np.array(c.extrinsic.transform).reshape(4, 4)
            fx, fy, cx, cy = c.intrinsic[:4]
            k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
            np.save(img_root / "intrinsic" / f"{cam}.npy", k)
            np.save(img_root / "pose" / f"{cam}.npy", cam2ego)
            if cam in images:
                hw = images[cam].shape[:2]
                np.save(
                    img_root / "correspondence" / f"{cam}.npy",
                    camera_correspondence(coord, cam2ego, k, hw),
                )
                painted = paint_colors(color, painted, coord, cam2ego, k, images[cam])
        np.save(out / "color.npy", color.astype(np.float32))
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--test_frame_file", default=None)
    args = parser.parse_args()
    test_frames = ()
    if args.test_frame_file:
        with open(args.test_frame_file) as f:
            test_frames = {l.strip() for l in f}
    for tf_path in sorted(
        glob.glob(os.path.join(args.dataset_root, "*", "*.tfrecord"))
    ):
        n = parse_segment(tf_path, args.output_root, test_frames)
        print(f"{os.path.basename(tf_path)}: {n} frames")


if __name__ == "__main__":
    main()
