"""Point-cloud visualization dumps (.ply, no open3d dependency).

Parity: reference `pointcept/utils/visualization.py:25-115` (open3d point
cloud / bbox / lineset savers). Written as plain binary little-endian PLY so it
works without open3d.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def save_point_cloud(coord: np.ndarray, color=None, file_path="pc.ply", logger=None):
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    coord = np.asarray(coord, np.float32)
    if color is not None:
        color = np.asarray(color)
        if color.max() <= 1.001:
            color = color * 255
        color = color.astype(np.uint8)
    n = coord.shape[0]
    with open(file_path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += ["property float x", "property float y", "property float z"]
        if color is not None:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode())
        for i in range(n):
            f.write(struct.pack("<fff", *coord[i]))
            if color is not None:
                f.write(struct.pack("<BBB", *color[i]))
    if logger is not None:
        logger.info(f"Saved point cloud: {file_path}")


def save_bounding_boxes(bboxes_corners: np.ndarray, color=(1.0, 0.0, 0.0), file_path="bbox.ply", logger=None):
    """bboxes_corners: [N, 8, 3] box corner points; writes corner vertices."""
    corners = np.asarray(bboxes_corners, np.float32).reshape(-1, 3)
    colors = np.tile(np.asarray(color, np.float32), (corners.shape[0], 1))
    save_point_cloud(corners, colors, file_path, logger)


def save_lines(points: np.ndarray, lines: np.ndarray, color=(1.0, 0.0, 0.0), file_path="line.ply", logger=None):
    """Sample dense points along line segments and dump as a point cloud."""
    points = np.asarray(points, np.float32)
    lines = np.asarray(lines, np.int64)
    samples = []
    for a, b in lines:
        t = np.linspace(0, 1, 32)[:, None]
        samples.append(points[a][None] * (1 - t) + points[b][None] * t)
    pts = np.concatenate(samples) if samples else np.zeros((0, 3), np.float32)
    colors = np.tile(np.asarray(color, np.float32), (pts.shape[0], 1))
    save_point_cloud(pts, colors, file_path, logger)
