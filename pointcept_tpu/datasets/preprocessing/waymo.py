"""Waymo Open Dataset preprocessing (SDK-gated).

Parity: reference `pointcept/datasets/preprocessing/waymo/preprocess_waymo.py`
— converts tfrecord segments into per-frame npy folders of
coord / strength / segment (both lidar returns concatenated), keeping only
frames with 3D segmentation labels for val/test per the official
`3d_semseg_test_set_frames.txt`.

Requires `waymo-open-dataset` + TensorFlow (not bundled in this image — run
where the SDK lives):

  python -m pointcept_tpu.datasets.preprocessing.waymo \
      --dataset_root <waymo_tfrecords> --output_root data/waymo --split training
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np


def frame_points_and_labels(frame):
    """All lidar returns of one frame -> (coord [N,3], strength [N,1],
    segment [N] or -1). Uses the official range-image conversion utilities."""
    from waymo_open_dataset.utils import frame_utils

    (range_images, camera_projections, segmentation_labels, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame)
    )
    coords, strengths, segments = [], [], []
    for ri_index in (0, 1):
        points, _cp = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=ri_index, keep_polar_features=True,
        )
        # keep_polar_features: rows are (range, intensity, elongation, x, y, z)
        for lidar_id, pts in zip(sorted(range_images.keys()), points):
            coords.append(pts[:, 3:6])
            strengths.append(np.tanh(pts[:, 1:2]))  # official intensity squash
            if segmentation_labels and lidar_id in segmentation_labels:
                sl = segmentation_labels[lidar_id][ri_index]
                sl_tensor = np.reshape(np.asarray(sl.data), sl.shape.dims)
                ri = range_images[lidar_id][ri_index]
                ri_tensor = np.reshape(np.asarray(ri.data), ri.shape.dims)
                mask = ri_tensor[..., 0] > 0
                segments.append(sl_tensor[mask][:, 1].astype(np.int32))  # semantic channel
            else:
                segments.append(np.full(pts.shape[0], -1, np.int32))
    return (
        np.concatenate(coords).astype(np.float32),
        np.concatenate(strengths).astype(np.float32),
        np.concatenate(segments),
    )


def parse_segment_file(tf_path, output_root, only_labeled=False):
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    seg_name = Path(tf_path).stem.replace("_with_camera_labels", "")
    ds = tf.data.TFRecordDataset(tf_path, compression_type="")
    for i, raw in enumerate(ds):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(raw.numpy()))
        has_label = any(
            len(c.ri_return1.segmentation_label_compressed) > 0 for c in frame.lasers
        )
        if only_labeled and not has_label:
            continue
        coord, strength, segment = frame_points_and_labels(frame)
        out = Path(output_root) / seg_name / f"{i:06d}"
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "coord.npy", coord)
        np.save(out / "strength.npy", strength)
        np.save(out / "segment.npy", segment)
        print(f"{seg_name}/{i:06d}: {coord.shape[0]} pts (labeled={has_label})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--split", default="training", choices=("training", "validation", "testing"))
    parser.add_argument("--only_labeled", action="store_true")
    args = parser.parse_args()
    files = sorted(glob.glob(os.path.join(args.dataset_root, args.split, "*.tfrecord")))
    out = Path(args.output_root) / ("train" if args.split == "training" else
                                    "val" if args.split == "validation" else "test")
    for tf_path in files:
        parse_segment_file(tf_path, out, only_labeled=args.only_labeled)


if __name__ == "__main__":
    main()
