"""Shared Concerto-export machinery (pure numpy, no GPU deps).

Parity targets (behavior, not code):
  * correspondence tables — reference `concerto/scannet/preprocess_scannet.py`
    `correspondenceGet/correspondenceSave` (camtools mesh raycast + cKDTree
    snap). TPU repo: a z-buffer over the scene's own points — same output
    format ([M, 3] float rows of (pixel_x, pixel_y, point_index), `-ones((1,3))`
    when nothing is visible).
  * depth backprojection + grid normals — reference
    `concerto/structured3d/preprocess_structured3d.py:73-84, 240-260`.
  * ground-plane alignment — reference `concerto/re10k/preprocess_re10k.py`
    `extract_and_align_ground_plane` (open3d RANSAC). TPU repo: own numpy
    RANSAC with the same accept/retry policy.
  * context-view selection — reference `preprocess_re10k.py`
    `calDelta`/`parse_scene` walk.
  * splits manifests — reference `concerto/<dataset>/splits.py` (x10, all the
    same scan); one table-driven writer here.
"""

from __future__ import annotations

import json
import os

import numpy as np


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def depth_to_points(depth, intrinsic, cam_to_world=None, depth_scale=1.0):
    """Backproject a depth image into (world) points.

    depth: [H, W] (0 / non-finite = invalid), intrinsic: [3, 3],
    cam_to_world: optional [4, 4]. Returns (points [H, W, 3], valid [H, W]).
    """
    depth = np.asarray(depth, np.float64) / float(depth_scale)
    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
    rays = pix @ np.linalg.inv(np.asarray(intrinsic, np.float64)[:3, :3]).T
    pts = rays * depth[..., None]
    valid = np.isfinite(depth) & (depth > 0)
    if cam_to_world is not None:
        T = np.asarray(cam_to_world, np.float64)
        pts = pts @ T[:3, :3].T + T[:3, 3]
    return pts.astype(np.float32), valid


def normal_from_grid(points_hw3):
    """Per-pixel normals from the cross product of image-grid neighbors.

    Same signal as reference `normal_from_cross_product` (structured3d):
    n(x, y) = normalize((p(x+1, y) - p) x (p(x, y+1) - p)), last row/col padded
    by edge replication so the output keeps the input shape.
    """
    p = np.asarray(points_hw3, np.float64)
    dx = np.empty_like(p)
    dy = np.empty_like(p)
    dx[:, :-1] = p[:, 1:] - p[:, :-1]
    dx[:, -1] = dx[:, -2]
    dy[:-1] = p[1:] - p[:-1]
    dy[-1] = dy[-2]
    n = np.cross(dx, dy)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(norm, 1e-8)).astype(np.float32)


def project_points(coord, intrinsic, world_to_cam, hw):
    """Project world points into a pinhole camera.

    Returns (uv [N, 2] float pixel coords, z [N] camera depth,
    inside [N] bool: positive depth and inside the image).
    """
    coord = np.asarray(coord, np.float64)
    T = np.asarray(world_to_cam, np.float64)
    cam = coord @ T[:3, :3].T + T[:3, 3]
    z = cam[:, 2]
    safe_z = np.where(np.abs(z) < 1e-9, 1e-9, z)
    uvw = cam @ np.asarray(intrinsic, np.float64)[:3, :3].T
    uv = uvw[:, :2] / safe_z[:, None]
    h, w = hw
    # bound-check the nearest-pixel bin (what consumers index with), so points
    # that project to a border pixel center (u = 0 +/- eps) stay inside
    pix = np.round(uv)
    inside = (z > 1e-6) & (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
    return uv, z, inside


def zbuffer_correspondence(coord, intrinsic, cam_to_world, hw, z_tolerance=0.05):
    """[M, 3] (pixel_x, pixel_y, point_index) of visible points, or -ones((1,3)).

    Occlusion: keep points within `z_tolerance` of the nearest depth in their
    pixel (reference raycasts the mesh and snaps via a 1 cm kdtree query; a
    point z-buffer over the exported cloud produces the same table for the
    loader — both drop occluded points, format identical).
    """
    pose = np.asarray(cam_to_world, np.float64)
    if not np.isfinite(pose).all():
        return -np.ones((1, 3), np.float32)
    uv, z, inside = project_points(coord, intrinsic, np.linalg.inv(pose), hw)
    idxs = np.flatnonzero(inside)
    if idxs.size == 0:
        return -np.ones((1, 3), np.float32)
    ui = np.round(uv[idxs]).astype(np.int64)
    px = ui[:, 1] * hw[1] + ui[:, 0]
    zz = z[idxs]
    order = np.lexsort((zz, px))
    run_head = np.concatenate([[True], px[order][1:] != px[order][:-1]])
    head_pos = np.maximum.accumulate(np.where(run_head, np.arange(order.size), 0))
    nearest = zz[order][head_pos]
    keep = np.empty(idxs.size, bool)
    keep[order] = zz[order] <= nearest + z_tolerance
    idxs = idxs[keep]
    if idxs.size == 0:
        return -np.ones((1, 3), np.float32)
    rows = np.concatenate(
        [uv[idxs].astype(np.float32), idxs[:, None].astype(np.float32)], axis=1
    )
    return rows


def ground_plane_align(
    points,
    height_percentile=20,
    distance_threshold=0.01,
    iterations=1000,
    max_angle_degree=40,
    max_trials=6,
    seed=0,
):
    """Rotate the scene so its dominant low plane is z-up at z=0.

    Numpy RANSAC with the reference's policy (`extract_and_align_ground_plane`):
    fit planes among the lowest `height_percentile`% points; if the plane
    normal is within `max_angle_degree` of +z accept it, else discard its
    inliers and retry (up to `max_trials`). Returns
    (rotation [3, 3], z_offset, inlier_indices); apply as
    `points @ R.T; points[:, 2] -= offset`. Raises ValueError on failure.
    """
    pts = np.asarray(points, np.float64)
    rng = np.random.default_rng(seed)
    z_thresh = np.percentile(pts[:, 2], height_percentile)
    remaining = np.flatnonzero(pts[:, 2] <= z_thresh)
    for _ in range(max_trials):
        if remaining.size < 3:
            raise ValueError("Not enough points left to fit a plane.")
        low = pts[remaining]
        best_inl, best_n, best_d = None, None, None
        for _ in range(iterations):
            tri = low[rng.choice(remaining.size, 3, replace=False)]
            n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
            nn = np.linalg.norm(n)
            if nn < 1e-12:
                continue
            n = n / nn
            d = -n @ tri[0]
            dist = np.abs(low @ n + d)
            inl = dist < distance_threshold
            if best_inl is None or inl.sum() > best_inl.sum():
                best_inl, best_n, best_d = inl, n, d
        if best_inl is None or best_inl.sum() < 3:
            raise ValueError("RANSAC found no plane.")
        normal = best_n if best_n[2] >= 0 else -best_n
        angle = np.degrees(np.arccos(np.clip(normal[2], -1.0, 1.0)))
        inliers_global = remaining[best_inl]
        if angle <= max_angle_degree:
            target = np.array([0.0, 0.0, 1.0])
            axis = np.cross(normal, target)
            s = np.linalg.norm(axis)
            if s < 1e-6:
                R = np.eye(3)
            else:
                axis = axis / s
                theta = np.arccos(np.clip(normal @ target, -1.0, 1.0))
                K = np.array(
                    [
                        [0, -axis[2], axis[1]],
                        [axis[2], 0, -axis[0]],
                        [-axis[1], axis[0], 0],
                    ]
                )
                R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
            offset = float(np.mean((pts[inliers_global] @ R.T)[:, 2]))
            return R, offset, inliers_global
        remaining = np.setdiff1d(remaining, inliers_global)
    raise ValueError("Failed to find a valid ground plane within max trials.")


# ---------------------------------------------------------------------------
# re10k-style context-view selection
# ---------------------------------------------------------------------------


def _euler_xyz_degrees(R):
    """Rotation matrix -> xyz Euler angles in degrees (scipy convention)."""
    sy = -R[2, 0]
    sy = np.clip(sy, -1.0, 1.0)
    y = np.arcsin(sy)
    if abs(sy) < 1.0 - 1e-9:
        x = np.arctan2(R[2, 1], R[2, 2])
        z = np.arctan2(R[1, 0], R[0, 0])
    else:  # gimbal lock
        x = np.arctan2(-R[1, 2], R[1, 1])
        z = 0.0
    return np.degrees([x, y, z])


def view_delta(ang_a, ang_b, pos_a, pos_b, alpha=20.0):
    """Reference `calDelta`: ||angle delta|| + alpha * ||position delta||."""
    ang = float(np.linalg.norm(np.asarray(ang_a) - np.asarray(ang_b)))
    dist = float(np.linalg.norm(np.asarray(pos_a) - np.asarray(pos_b)))
    return ang + alpha * dist, ang, dist


def select_context_views(
    extrinsics,
    num_context_views=4,
    frame_gap=(15, 135),
    overlap_range=(5, 40),
    seed=123,
):
    """Pick `num_context_views` frames of a video with bounded view overlap.

    Reference `preprocess_re10k.py` walk: start from a random frame, step
    outward (alternating past/future) at least `frame_gap[0]` frames, keep
    candidates whose `view_delta` lands inside `overlap_range`, stop a
    direction when overlap falls below the minimum or the gap exceeds
    `frame_gap[1]`; pick a random valid candidate per step. Returns a sorted
    index list, or None if no seed frame yields a full set.

    extrinsics: [V, 4, 4] world-to-cam (the reference converts to w2c first).
    """
    ex = np.asarray(extrinsics, np.float64)
    v = ex.shape[0]
    ang = np.stack([_euler_xyz_degrees(e[:3, :3]) for e in ex])
    pos = ex[:, :3, 3]
    rng = np.random.default_rng(seed)
    for start in rng.permutation(v):
        chosen = [int(start)]
        while len(chosen) < num_context_views:
            valid = []
            for step in (1, -1):
                anchor = max(chosen) if step == 1 else min(chosen)
                cur = anchor + step * frame_gap[0]
                while 0 <= cur < v:
                    overlap, _, _ = view_delta(ang[anchor], ang[cur], pos[anchor], pos[cur])
                    if overlap_range[0] <= overlap <= overlap_range[1]:
                        valid.append(cur)
                    if overlap < overlap_range[0] or abs(cur - anchor) > frame_gap[1]:
                        break
                    cur += step
            if not valid:
                break
            chosen.append(int(valid[rng.integers(len(valid))]))
        if len(chosen) == num_context_views:
            return sorted(chosen)
    return None


# ---------------------------------------------------------------------------
# export helpers + splits manifests
# ---------------------------------------------------------------------------


def save_image(path, array):
    """uint8 [H, W, 3] (or uint16 [H, W] depth) -> png."""
    from PIL import Image

    Image.fromarray(np.asarray(array)).save(path)


def export_image_scene(
    im_dir,
    colors,
    poses,
    intrinsics,
    coord=None,
    depths=None,
    z_tolerance=0.05,
):
    """Write one scene's image tree: color/, pose/, intrinsic/, correspondence/.

    colors: list of uint8 [H, W, 3]; poses: list of [4, 4] cam-to-world;
    intrinsics: one [3, 3]/[4, 4] (shared, written once as intrinsic.npy like
    the reference scannet exporter) or a list per frame; depths: optional list
    of uint16 [H, W] written to depth/; coord: [N, 3] world points for
    correspondence tables (skipped when None).
    """
    os.makedirs(os.path.join(im_dir, "color"), exist_ok=True)
    os.makedirs(os.path.join(im_dir, "pose"), exist_ok=True)
    os.makedirs(os.path.join(im_dir, "intrinsic"), exist_ok=True)
    shared_k = not isinstance(intrinsics, (list, tuple))
    if shared_k:
        np.save(os.path.join(im_dir, "intrinsic", "intrinsic.npy"), np.asarray(intrinsics))
    if coord is not None:
        os.makedirs(os.path.join(im_dir, "correspondence"), exist_ok=True)
    if depths is not None:
        os.makedirs(os.path.join(im_dir, "depth"), exist_ok=True)
    for i, (img, pose) in enumerate(zip(colors, poses)):
        save_image(os.path.join(im_dir, "color", f"{i}.png"), img)
        np.save(os.path.join(im_dir, "pose", f"{i}.npy"), np.asarray(pose, np.float32))
        k = intrinsics if shared_k else intrinsics[i]
        if not shared_k:
            np.save(os.path.join(im_dir, "intrinsic", f"{i}.npy"), np.asarray(k, np.float32))
        if depths is not None:
            save_image(os.path.join(im_dir, "depth", f"{i}.png"), depths[i])
        if coord is not None:
            corr = zbuffer_correspondence(
                coord, np.asarray(k)[:3, :3], pose, np.asarray(img).shape[:2], z_tolerance
            )
            np.save(os.path.join(im_dir, "correspondence", f"{i}.npy"), corr)


def write_splits(dataset_root, splits=("train", "val", "test"), rel_root=None, image_ext=".png"):
    """Scan `<root>/images/<split>/...` and write `<root>/splits/<split>.json`.

    One writer for every dataset family (the reference repeats this scan in
    ten `concerto/<dataset>/splits.py` scripts, re10k variant shown at
    `concerto/re10k/splits.py:6-46`). Scene directories may nest one extra
    level (structured3d's `scene/room`). Paths are rewritten relative to
    `rel_root` when given (the reference hard-rewrites to `data/<name>`).
    Returns {split: manifest}.
    """
    out = {}
    split_dir = os.path.join(dataset_root, "splits")
    os.makedirs(split_dir, exist_ok=True)

    def rel(p):
        return os.path.join(rel_root, os.path.relpath(p, dataset_root)) if rel_root else p

    for split in splits:
        im_split = os.path.join(dataset_root, "images", split)
        if not os.path.isdir(im_split):
            continue
        manifest = {}
        # scenes are dirs containing color/; allow one nesting level
        scene_dirs = []
        for entry in sorted(os.scandir(im_split), key=lambda e: e.name):
            if not entry.is_dir():
                continue
            if os.path.isdir(os.path.join(entry.path, "color")):
                scene_dirs.append((entry.name, entry.path))
            else:
                for sub in sorted(os.scandir(entry.path), key=lambda e: e.name):
                    if sub.is_dir() and os.path.isdir(os.path.join(sub.path, "color")):
                        scene_dirs.append((f"{entry.name}/{sub.name}", sub.path))
        for name, scene_path in scene_dirs:
            color_dir = os.path.join(scene_path, "color")
            frames = sorted(
                (f for f in os.listdir(color_dir) if f.endswith(image_ext)),
                key=lambda f: int(os.path.splitext(f)[0]),
            )
            manifest[name] = {
                "pointclouds": rel(os.path.join(dataset_root, split, name)),
                "images": [rel(os.path.join(color_dir, f)) for f in frames],
                "correspondences": [
                    rel(
                        os.path.join(
                            scene_path,
                            "correspondence",
                            os.path.splitext(f)[0] + ".npy",
                        )
                    )
                    for f in frames
                ],
            }
        with open(os.path.join(split_dir, f"{split}.json"), "w") as f:
            json.dump(manifest, f, indent=4)
        out[split] = manifest
    return out
