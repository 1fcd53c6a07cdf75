"""Concerto RE10K exporter: video chunks -> aligned point clouds + posed images.

Parity: reference `concerto/re10k/preprocess_re10k.py` — RE10K ships as torch
chunk files of {key, cameras [V, 18], images: list of encoded JPEG byte
tensors}; the reference picks `num_context_views` frames with bounded view
overlap, runs VGGT to predict per-pixel world pointmaps + refined poses, masks
by confidence, rotates the DUSt3R frame to z-up, rescales the scene to a 3 m
z-extent, RANSAC-aligns the ground plane, and exports the fused cloud plus
per-frame color/pose/intrinsic/correspondence. `concerto/re10k/splits.py`
then writes the manifests.

This exporter keeps the pipeline but takes the geometry network as an
injectable `predictor(images_u8) -> dict` (VGGT is an external checkpoint;
tests use an analytic predictor). Every step downstream of the network —
context selection, z-up conversion, scaling, ground alignment, grid normals
flipped toward the camera, exact pixel->point correspondences — is pure
numpy and unit-tested.
"""

from __future__ import annotations

import argparse
import io
import os
from pathlib import Path

import numpy as np

from pointcept_tpu.datasets.preprocessing.concerto.common import (
    ground_plane_align,
    normal_from_grid,
    save_image,
    select_context_views,
    write_splits,
)


def decode_poses(cameras):
    """RE10K camera rows -> (w2c [V, 4, 4], K_norm [V, 3, 3]).

    Row layout (reference `convert_poses`): fx, fy, cx, cy (normalized by
    image size), 2 unused, then the 3x4 world-to-cam matrix row-major.
    """
    cams = np.asarray(cameras, np.float64)
    v = cams.shape[0]
    K = np.tile(np.eye(3), (v, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = cams[:, 0], cams[:, 1]
    K[:, 0, 2], K[:, 1, 2] = cams[:, 2], cams[:, 3]
    w2c = np.tile(np.eye(4), (v, 1, 1))
    w2c[:, :3, :] = cams[:, 6:18].reshape(v, 3, 4)
    return w2c, K


def intrinsics_to_pixels(K_norm, hw):
    """Normalized intrinsics -> pixel units for an (H, W) image."""
    h, w = hw
    scale = np.diag([w, h, 1.0])
    return np.einsum("ij,vjk->vik", scale, np.asarray(K_norm, np.float64))


def decode_images(images):
    """List of encoded image byte buffers -> uint8 [V, H, W, 3]."""
    from PIL import Image

    out = []
    for buf in images:
        arr = np.asarray(buf)
        out.append(np.asarray(Image.open(io.BytesIO(arr.tobytes())).convert("RGB")))
    return np.stack(out)


def rotx(deg):
    t = np.deg2rad(deg)
    return np.array(
        [[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]], np.float64
    )


def to_zup(points, cam_to_world):
    """DUSt3R/VGGT y-down frame -> z-up with the min corner at the origin.

    Reference `Coord2zup`: rotate -90 deg about x, then translate the min to 0,
    applying the same transform to the camera poses.
    """
    R = rotx(-90)
    pts = points @ R.T
    t = pts.min(axis=0)
    pts = pts - t
    c2w = np.array([np.asarray(T, np.float64) for T in cam_to_world])
    c2w[:, :3, :3] = R @ c2w[:, :3, :3]
    c2w[:, :3, 3] = (c2w[:, :3, 3] @ R.T) - t
    return pts, c2w


def export_scene(
    images_u8,
    predictor,
    pc_dir,
    im_dir,
    conf_threshold=0.0,
    target_z_extent=3.0,
    seed=0,
):
    """Fuse predicted pointmaps into an aligned cloud + image tree.

    predictor(images_u8) must return a dict with:
      world_points [V, H, W, 3] (y-down network frame),
      conf [V, H, W], cam_to_world [V, 4, 4], intrinsics [V, 3, 3] (pixels).
    Returns the number of exported points, or 0 when ground alignment fails
    (the reference skips such scenes).
    """
    pred = predictor(images_u8)
    v, h, w = images_u8.shape[:3]
    wp = np.asarray(pred["world_points"], np.float64).reshape(v, h, w, 3)
    conf = np.asarray(pred["conf"], np.float64).reshape(v, h, w)
    mask = conf > conf_threshold

    # per-pixel rows: (x, y, frame); normals from each frame's pointmap grid,
    # flipped toward its camera center
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    normals = np.stack([normal_from_grid(wp[i]) for i in range(v)])
    c2w = np.array([np.asarray(T, np.float64) for T in pred["cam_to_world"]])
    centers = c2w[:, :3, 3]
    view = wp - centers[:, None, None, :]
    flip = (normals * view).sum(-1) > 0
    normals = np.where(flip[..., None], -normals, normals)

    points = wp[mask]
    colors = images_u8[mask]
    nrm = normals[mask]
    frame_of = np.broadcast_to(np.arange(v)[:, None, None], mask.shape)[mask]
    px = np.broadcast_to(xs, mask.shape)[mask]
    py = np.broadcast_to(ys, mask.shape)[mask]
    if points.shape[0] < 100:
        return 0

    points, c2w = to_zup(points, c2w)
    z_extent = points[:, 2].max() - points[:, 2].min()
    scale = target_z_extent / max(z_extent, 1e-9)
    points *= scale
    c2w[:, :3, 3] *= scale

    try:
        R, offset, _ = ground_plane_align(points, seed=seed)
    except ValueError:
        return 0
    points = points @ R.T
    points[:, 2] -= offset
    nrm = nrm @ R.T
    c2w[:, :3, :3] = R @ c2w[:, :3, :3]
    c2w[:, :3, 3] = c2w[:, :3, 3] @ R.T
    c2w[:, 2, 3] -= offset

    os.makedirs(pc_dir, exist_ok=True)
    np.save(os.path.join(pc_dir, "coord.npy"), points.astype(np.float32))
    np.save(os.path.join(pc_dir, "color.npy"), colors.astype(np.uint8))
    np.save(os.path.join(pc_dir, "normal.npy"), nrm.astype(np.float32))

    for sub in ("color", "pose", "intrinsic", "correspondence"):
        os.makedirs(os.path.join(im_dir, sub), exist_ok=True)
    point_ids = np.arange(points.shape[0])
    for i in range(v):
        save_image(os.path.join(im_dir, "color", f"{i}.png"), images_u8[i])
        np.save(os.path.join(im_dir, "pose", f"{i}.npy"), c2w[i].astype(np.float32))
        np.save(
            os.path.join(im_dir, "intrinsic", f"{i}.npy"),
            np.asarray(pred["intrinsics"][i], np.float32),
        )
        sel = frame_of == i
        if sel.any():
            corr = np.stack([px[sel], py[sel], point_ids[sel]], axis=1).astype(np.float32)
        else:
            corr = -np.ones((1, 3), np.float32)
        np.save(os.path.join(im_dir, "correspondence", f"{i}.npy"), corr)
    return int(points.shape[0])


def load_chunk(chunk_path):
    """A RE10K chunk file -> list of {key, cameras, images} (torch storage)."""
    import torch

    return torch.load(chunk_path, map_location="cpu", weights_only=False)


def vggt_predictor(device="cpu"):
    """The reference's geometry network (external; not bundled).

    Raises ImportError unless the `vggt` package + checkpoint are installed;
    inject any callable with the same contract instead (see `export_scene`).
    """
    try:
        from vggt.models.vggt import VGGT  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "RE10K export needs a pointmap predictor. Install VGGT "
            "(facebookresearch/vggt) or pass --predictor pointing at a "
            "callable `pkg.module:fn(images_u8) -> dict`."
        ) from e
    raise NotImplementedError("wire the installed VGGT checkpoint here")


def process_chunk(
    chunk_path,
    output_root,
    predictor,
    num_context_views=4,
    frame_gap=(15, 135),
    overlap_range=(5, 40),
    conf=0.0,
    seed=123,
):
    split = Path(chunk_path).parts[-2]
    exported = 0
    for example in load_chunk(chunk_path):
        scene = example["key"]
        w2c, _ = decode_poses(example["cameras"])
        chosen = select_context_views(
            w2c, num_context_views, frame_gap, overlap_range, seed=seed
        )
        if chosen is None:
            continue
        images = decode_images([example["images"][i] for i in chosen])
        n = export_scene(
            images,
            predictor,
            os.path.join(output_root, split, scene),
            os.path.join(output_root, "images", split, scene),
            conf_threshold=conf,
            seed=seed,
        )
        if n:
            exported += 1
            print(f"{scene} [{split}]: {n} points from {len(chosen)} views")
    return exported


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="dir with <split>/*.torch chunks")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--splits", nargs="+", default=["train", "test"])
    parser.add_argument("--num_context_views", type=int, default=4)
    parser.add_argument("--frame_gap", type=int, nargs=2, default=[15, 135])
    parser.add_argument("--overlap_range", type=float, nargs=2, default=[5, 40])
    parser.add_argument("--conf", type=float, default=0.0)
    parser.add_argument(
        "--predictor", default=None, help="pkg.module:fn returning the predictor callable"
    )
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--thread_id", type=int, default=0)
    args = parser.parse_args()

    if args.predictor:
        mod, fn = args.predictor.split(":")
        import importlib

        predictor = getattr(importlib.import_module(mod), fn)()
    else:
        predictor = vggt_predictor()

    chunks = []
    for split in args.splits:
        root = Path(args.dataset_root) / split
        chunks += sorted(p for p in root.iterdir() if ".json" not in p.name)
    chunks = np.array_split(np.array(chunks, dtype=object), args.num_workers)[args.thread_id]
    total = 0
    for chunk in chunks:
        total += process_chunk(
            chunk,
            args.output_root,
            predictor,
            args.num_context_views,
            tuple(args.frame_gap),
            tuple(args.overlap_range),
            args.conf,
        )
    write_splits(args.output_root, splits=tuple(args.splits))
    print(f"exported {total} scenes")


if __name__ == "__main__":
    main()
