"""Export per-scene 2D DINO features for DINOEnhancedSegmentor /
DINOSemSegTester.

Parity: reference
`pointcept/datasets/preprocessing/scannet/dino/preprocess_dino_feature.py:185`:
for every `frame_skip`-th RGB-D frame, run the DINO backbone on the
center-cropped color image, bilinearly upsample the patch tokens to pixel
resolution, back-project valid depths into world space, and grid-average the
accumulated (coord, feat) pairs at `grid_size`. Output:
`<output_root>/<split>/<scene>.npz` with f16 `coord [M, 3]` / `feat [M, C]` —
the layout `DINOEnhancedSegmentor` kNN-maps onto scene points
(`models/default.py`, reference `:259`).

Deviations from the reference: depth comes from the captured `.sens` depth
stream instead of open3d mesh raycasting (no open3d in this stack), and the 2D
model loads through HF transformers (`models/concerto/enc2d.py`) instead of
torch.hub.

Usage:
    python -m pointcept_tpu.datasets.preprocessing.scannet.dino_features \
        --dataset_root scans/ --output_root data/scannet_dino \
        --model_weight facebook/dinov2-base [--split train] [--frame_skip 20]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from pointcept_tpu.datasets.preprocessing.scannet.scannet_pair import (
    SensReader,
    _decode_jpeg,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def center_crop(img: np.ndarray, crop_ratio: float, patch_size: int) -> np.ndarray:
    """Center crop to `crop_ratio`, rounded down to a patch multiple."""
    h, w = img.shape[:2]
    ch = int(h * crop_ratio) // patch_size * patch_size
    cw = int(w * crop_ratio) // patch_size * patch_size
    top, left = (h - ch) // 2, (w - cw) // 2
    return img[top : top + ch, left : left + cw]


def _grid_average(coord, feat, count, grid_size):
    """Voxel-average accumulated samples (stable against frame streaming)."""
    grid = np.floor(coord / grid_size).astype(np.int64)
    uniq, cluster = np.unique(grid, axis=0, return_inverse=True)
    m = uniq.shape[0]
    c_sum = np.zeros((m, 3), np.float64)
    f_sum = np.zeros((m, feat.shape[1]), np.float64)
    n_sum = np.zeros((m,), np.float64)
    np.add.at(c_sum, cluster, coord * count[:, None])
    np.add.at(f_sum, cluster, feat)
    np.add.at(n_sum, cluster, count)
    return (c_sum / n_sum[:, None]).astype(np.float32), f_sum.astype(np.float32), n_sum


def parse_scene(
    sens_path,
    output_root,
    split,
    encoder,
    patch_size=14,
    frame_skip=20,
    grid_size=0.08,
    crop_ratio=0.95,
):
    scene_id = os.path.basename(os.path.dirname(sens_path))
    reader = SensReader(sens_path)
    k = reader.intrinsic_depth
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    acc_coord = np.zeros((0, 3), np.float32)
    acc_feat = None
    acc_count = np.zeros((0,), np.float64)
    for i, pose, color_bytes, depth_u16 in reader.frames():
        if i % frame_skip != 0 or not np.isfinite(pose).all():
            continue
        h, w = depth_u16.shape
        color = _decode_jpeg(color_bytes)
        if color.shape[:2] != (h, w):
            from PIL import Image

            color = np.asarray(Image.fromarray(color).resize((w, h)))
        color = center_crop(color, crop_ratio, patch_size)
        depth = center_crop(depth_u16, crop_ratio, patch_size)
        ch, cw = depth.shape
        oy, ox = (h - ch) // 2, (w - cw) // 2

        img = (color.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        feat_hw = encoder(img, ch // patch_size, cw // patch_size)  # [ph, pw, C]
        # bilinear patch -> pixel upsample
        from PIL import Image

        c2d = feat_hw.shape[-1]
        up = np.stack(
            [
                np.asarray(
                    Image.fromarray(feat_hw[..., c].astype(np.float32), mode="F").resize(
                        (cw, ch), Image.BILINEAR
                    )
                )
                for c in range(c2d)
            ],
            axis=-1,
        )

        valid = depth != 0
        z = depth[valid].astype(np.float32) / reader.depth_shift
        v, u = np.nonzero(valid)
        cam = np.stack([(u + ox - cx) * z / fx, (v + oy - cy) * z / fy, z, np.ones_like(z)], 1)
        world = (cam @ pose.T)[:, :3]

        acc_coord = np.concatenate([acc_coord, world.astype(np.float32)])
        frame_feat = up[valid]
        acc_feat = (
            frame_feat if acc_feat is None else np.concatenate([acc_feat, frame_feat])
        )
        acc_count = np.concatenate([acc_count, np.ones(world.shape[0])])
        # keep the accumulator bounded: re-pool every frame (reference does the
        # same inside its loop)
        acc_coord, acc_feat, acc_count = _grid_average(acc_coord, acc_feat, acc_count, grid_size)
    reader.close()
    if acc_feat is None:
        return 0
    feat = (acc_feat / acc_count[:, None]).astype(np.float16)
    os.makedirs(os.path.join(output_root, split), exist_ok=True)
    np.savez(
        os.path.join(output_root, split, f"{scene_id}.npz"),
        coord=acc_coord.astype(np.float16),
        feat=feat,
    )
    return acc_coord.shape[0]


class HFDinoEncoder:
    """HF-transformers DINOv2 patch-feature extractor (frozen, host-side)."""

    def __init__(self, model_weight: str):
        import torch
        from transformers import AutoModel

        self.torch = torch
        self.model = AutoModel.from_pretrained(model_weight).eval()

    def __call__(self, img_hw3: np.ndarray, ph: int, pw: int) -> np.ndarray:
        torch = self.torch
        with torch.inference_mode():
            x = torch.from_numpy(np.moveaxis(img_hw3, -1, 0)[None])
            out = self.model(x).last_hidden_state
            tokens = out[:, -ph * pw :, :]  # strip cls/register tokens
            return tokens[0].reshape(ph, pw, -1).numpy()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--model_weight", default="facebook/dinov2-base")
    parser.add_argument("--patch_size", type=int, default=14)
    parser.add_argument("--frame_skip", type=int, default=20)
    parser.add_argument("--grid_size", type=float, default=0.08)
    args = parser.parse_args()
    encoder = HFDinoEncoder(args.model_weight)
    for sens in sorted(glob.glob(os.path.join(args.dataset_root, "*", "*.sens"))):
        n = parse_scene(
            sens, args.output_root, args.split, encoder,
            patch_size=args.patch_size, frame_skip=args.frame_skip, grid_size=args.grid_size,
        )
        print(f"{sens}: {n} pooled points")


if __name__ == "__main__":
    main()
