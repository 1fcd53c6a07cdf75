"""ScanNet RGB-D frame-pair extraction for PointContrast pretraining.

Parity: reference `pointcept/datasets/preprocessing/scannet/scannet_pair/*`
(`preprocess.py`, `SensorData.py`, `point_cloud_extractor.py:13`,
`compute_full_overlapping.py:53`). Pipeline per scene:

1. parse the `.sens` stream (ScanNet SensorData v4 binary: header with
   color/depth intrinsics + per-frame pose/jpeg/zlib-uint16-depth records),
   keeping every `frame_skip`-th frame;
2. back-project each kept depth map through the depth intrinsics and camera
   pose into a world-frame partial point cloud with RGB, saved as
   `<scene>/pcd/<frame>.npz` (coord, color) — the `ScanNetPairDataset`
   loader's format (`datasets/scannet_pair.py`);
3. compute pairwise overlap ratios between the partial clouds on a
   `voxel_size` grid and write `<scene>/pcd/overlap.txt`
   (`name1 name2 ratio` lines; the loader keeps pairs above its threshold).

Overlap here is voxel-hash based (no KD-tree dependency): clouds are voxelized
at `voxel_size`; a voxel of cloud A "matches" if any voxel of cloud B falls in
its 3x3x3 neighborhood (the reference's 1.5*voxel radius on downsampled
clouds); ratio = max of the two directional matched fractions.

Usage:
    python -m pointcept_tpu.datasets.preprocessing.scannet.scannet_pair \
        --dataset_root scans/ --output_root data/scannet_pair [--frame_skip 25]
"""

from __future__ import annotations

import argparse
import glob
import io
import itertools
import os
import struct
import zlib

import numpy as np


class SensReader:
    """Minimal ScanNet `.sens` (SensorData v4) stream reader."""

    COLOR_COMPRESSION = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
    DEPTH_COMPRESSION = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        f = self._f
        (version,) = struct.unpack("I", f.read(4))
        assert version == 4, f"unsupported .sens version {version}"
        (strlen,) = struct.unpack("Q", f.read(8))
        self.sensor_name = f.read(strlen).decode("ascii", "replace")
        mats = np.frombuffer(f.read(4 * 16 * 4), np.float32).reshape(4, 4, 4)
        self.intrinsic_color, self.extrinsic_color = mats[0], mats[1]
        self.intrinsic_depth, self.extrinsic_depth = mats[2], mats[3]
        cc, dc = struct.unpack("ii", f.read(8))
        self.color_compression = self.COLOR_COMPRESSION[cc]
        self.depth_compression = self.DEPTH_COMPRESSION[dc]
        (self.color_width, self.color_height, self.depth_width, self.depth_height) = struct.unpack(
            "IIII", f.read(16)
        )
        (self.depth_shift,) = struct.unpack("f", f.read(4))
        (self.num_frames,) = struct.unpack("Q", f.read(8))

    def frames(self):
        """Yield (index, pose_4x4, color_bytes, depth_u16 [H, W])."""
        f = self._f
        for i in range(self.num_frames):
            pose = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
            f.read(16)  # color/depth timestamps
            color_n, depth_n = struct.unpack("QQ", f.read(16))
            color = f.read(color_n)
            depth_raw = f.read(depth_n)
            if self.depth_compression == "zlib_ushort":
                depth_raw = zlib.decompress(depth_raw)
            depth = np.frombuffer(depth_raw, np.uint16).reshape(
                self.depth_height, self.depth_width
            )
            yield i, pose, color, depth

    def close(self):
        self._f.close()


def _decode_jpeg(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def backproject(depth_u16, color_img, intrinsic_depth, pose, depth_shift=1000.0):
    """Depth map -> world-frame (coord [N, 3] f32, color [N, 3] u8)."""
    h, w = depth_u16.shape
    valid = depth_u16 != 0
    z = depth_u16[valid].astype(np.float32) / depth_shift
    v, u = np.nonzero(valid)
    fx, fy = intrinsic_depth[0, 0], intrinsic_depth[1, 1]
    cx, cy = intrinsic_depth[0, 2], intrinsic_depth[1, 2]
    bx, by = intrinsic_depth[0, 3], intrinsic_depth[1, 3]
    cam = np.stack(
        [(u - cx) * z / fx + bx, (v - cy) * z / fy + by, z, np.ones_like(z)], axis=1
    )
    world = cam @ pose.T
    if color_img.shape[:2] != depth_u16.shape:
        from PIL import Image

        color_img = np.asarray(Image.fromarray(color_img).resize((w, h)))
    return world[:, :3].astype(np.float32), color_img[valid]


def _voxel_set(coord, voxel_size):
    v = np.floor(coord / voxel_size).astype(np.int64)
    return {tuple(row) for row in np.unique(v, axis=0)}


def overlap_ratio(vox_a, vox_b):
    """Directional-max matched-voxel fraction within a one-cell neighborhood."""
    if not vox_a or not vox_b:
        return 0.0
    offs = list(itertools.product((-1, 0, 1), repeat=3))

    def directional(src, dst):
        hit = 0
        for v in src:
            if any((v[0] + o[0], v[1] + o[1], v[2] + o[2]) in dst for o in offs):
                hit += 1
        return hit / len(src)

    return max(directional(vox_a, vox_b), directional(vox_b, vox_a))


def process_scene(sens_path, out_dir, frame_skip=25, voxel_size=0.05):
    scene_id = os.path.basename(os.path.dirname(sens_path))
    pcd_dir = os.path.join(out_dir, scene_id, "pcd")
    os.makedirs(pcd_dir, exist_ok=True)
    reader = SensReader(sens_path)
    names = []
    for i, pose, color_bytes, depth in reader.frames():
        if i % frame_skip != 0:
            continue
        if not np.isfinite(pose).all():
            continue
        color = _decode_jpeg(color_bytes) if reader.color_compression == "jpeg" else None
        coord, rgb = backproject(depth, color, reader.intrinsic_depth, pose, reader.depth_shift)
        if coord.shape[0] == 0:
            continue
        name = f"{i}.npz"
        np.savez(os.path.join(pcd_dir, name), coord=coord, color=rgb)
        names.append(name)
    reader.close()

    vox = {
        n: _voxel_set(np.load(os.path.join(pcd_dir, n))["coord"], voxel_size) for n in names
    }
    with open(os.path.join(pcd_dir, "overlap.txt"), "w") as f:
        for a, b in itertools.combinations(names, 2):
            f.write(f"{a} {b} {overlap_ratio(vox[a], vox[b]):.4f}\n")
    return len(names)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="dir of scene folders with .sens files")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--frame_skip", type=int, default=25)
    parser.add_argument("--voxel_size", type=float, default=0.05)
    args = parser.parse_args()
    sens_files = sorted(glob.glob(os.path.join(args.dataset_root, "*", "*.sens")))
    for p in sens_files:
        n = process_scene(p, args.output_root, args.frame_skip, args.voxel_size)
        print(f"{p}: {n} frames")


if __name__ == "__main__":
    main()
