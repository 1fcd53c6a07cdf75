"""Concerto ScanNet image/correspondence exporter.

Parity: reference `concerto/scannet/preprocess_scannet.py` — parses each
scene's `.sens` RGB-D stream (public ScanNet binary format, version 4),
exports color/depth/pose/intrinsic frames at `frame_gap` stride, and writes
per-frame point->pixel correspondence tables against the scene's preprocessed
point cloud. The reference raycasts the mesh via camtools + open3d; this
exporter z-buffers the preprocessed cloud itself (`common.zbuffer_correspondence`)
— same output table format, no mesh dependency.

Point clouds are expected to already exist (from the base scannet
preprocessor, `datasets/preprocessing/scannet/`); pass `--parse_pointclouds`
paths as in the reference if re-deriving them.
"""

from __future__ import annotations

import argparse
import glob
import io
import os
import struct
import zlib

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import (
    export_image_scene,
    write_splits,
)

SENS_VERSION = 4
COLOR_COMPRESSION = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
DEPTH_COMPRESSION = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}


class SensStream:
    """Minimal reader for ScanNet `.sens` files (format v4).

    Layout: u32 version; u64 name length + bytes; 4x [16 f32] matrices
    (color/depth intrinsic+extrinsic); i32 color/depth compression enums;
    u32 color W/H, depth W/H; f32 depth_shift; u64 frame count; then per
    frame: [16 f32] camera_to_world, 2x u64 timestamps, u64 color/depth byte
    sizes, raw payloads (jpeg color, zlib'd u16 depth).

    Frames decode lazily — `color(i)` / `depth(i)` read from the buffered
    payloads, so exporting every k-th frame never touches the rest.
    """

    def __init__(self, path):
        with open(path, "rb") as f:
            data = f.read()
        self._mv = memoryview(data)
        off = 0

        def take(fmt):
            nonlocal off
            vals = struct.unpack_from(fmt, data, off)
            off += struct.calcsize(fmt)
            return vals if len(vals) > 1 else vals[0]

        version = take("<I")
        if version != SENS_VERSION:
            raise ValueError(f"unsupported .sens version {version}")
        name_len = take("<Q")
        self.sensor_name = bytes(self._mv[off : off + name_len]).decode("ascii", "replace")
        off += name_len
        mats = [np.array(take("<16f"), np.float32).reshape(4, 4) for _ in range(4)]
        (
            self.intrinsic_color,
            self.extrinsic_color,
            self.intrinsic_depth,
            self.extrinsic_depth,
        ) = mats
        self.color_compression = COLOR_COMPRESSION[take("<i")]
        self.depth_compression = DEPTH_COMPRESSION[take("<i")]
        self.color_hw = tuple(reversed(take("<2I")))  # stored W, H
        self.depth_hw = tuple(reversed(take("<2I")))
        self.depth_shift = take("<f")
        num_frames = take("<Q")
        self.frames = []
        for _ in range(num_frames):
            pose = np.array(take("<16f"), np.float32).reshape(4, 4)
            take("<2Q")  # color/depth timestamps, unused
            c_size, d_size = take("<2Q")
            c_span = (off, c_size)
            off += c_size
            d_span = (off, d_size)
            off += d_size
            self.frames.append((pose, c_span, d_span))

    def __len__(self):
        return len(self.frames)

    def pose(self, i):
        return self.frames[i][0]

    def color(self, i):
        from PIL import Image

        start, size = self.frames[i][1]
        if self.color_compression == "raw":
            arr = np.frombuffer(self._mv[start : start + size], np.uint8)
            return arr.reshape(*self.color_hw, 3)
        if self.color_compression in ("jpeg", "png"):
            return np.asarray(Image.open(io.BytesIO(bytes(self._mv[start : start + size]))))
        raise ValueError(f"unsupported color compression {self.color_compression}")

    def depth(self, i):
        start, size = self.frames[i][2]
        raw = bytes(self._mv[start : start + size])
        if self.depth_compression == "zlib_ushort":
            raw = zlib.decompress(raw)
        elif self.depth_compression != "raw_ushort":
            raise ValueError(f"unsupported depth compression {self.depth_compression}")
        return np.frombuffer(raw, np.uint16).reshape(self.depth_hw)


def export_scene(
    sens_path,
    pc_dir,
    im_dir,
    frame_gap=75,
    export_depth=True,
    z_tolerance=0.05,
):
    """Export one scene's image tree from its .sens + preprocessed coord.npy."""
    sens = SensStream(sens_path)
    coord = None
    coord_path = os.path.join(pc_dir, "coord.npy")
    if os.path.exists(coord_path):
        coord = np.load(coord_path).astype(np.float32)
    ids = list(range(0, len(sens), frame_gap))
    colors = [sens.color(i) for i in ids]
    poses = [sens.pose(i) for i in ids]
    depths = [sens.depth(i) for i in ids] if export_depth else None
    export_image_scene(
        im_dir,
        colors,
        poses,
        sens.intrinsic_color,
        coord=coord,
        depths=depths,
        z_tolerance=z_tolerance,
    )
    return len(ids)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="dir with scans*/scene*/")
    parser.add_argument("--output_root", required=True)
    parser.add_argument(
        "--pointclouds_root",
        required=True,
        help="preprocessed scannet root with <split>/<scene>/coord.npy",
    )
    parser.add_argument("--frame_gap", type=int, default=75)
    parser.add_argument("--parse_depths", action="store_true")
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--thread_id", type=int, default=0)
    args = parser.parse_args()

    scene_paths = sorted(glob.glob(os.path.join(args.dataset_root, "scans*", "scene*")))
    scene_paths = np.array_split(np.array(scene_paths), args.num_workers)[args.thread_id]
    for scene_path in scene_paths:
        scene_id = os.path.basename(scene_path)
        split = None
        for cand in ("train", "val", "test"):
            if os.path.isdir(os.path.join(args.pointclouds_root, cand, scene_id)):
                split = cand
                break
        if split is None:
            print(f"skip {scene_id}: no preprocessed point cloud")
            continue
        n = export_scene(
            os.path.join(scene_path, f"{scene_id}.sens"),
            os.path.join(args.pointclouds_root, split, scene_id),
            os.path.join(args.output_root, "images", split, scene_id),
            frame_gap=args.frame_gap,
            export_depth=args.parse_depths,
        )
        print(f"{scene_id} [{split}]: {n} frames")
    write_splits(args.output_root)


if __name__ == "__main__":
    main()
