"""Grid-sample + BEV chunking of huge scenes (ScanNet++ training prep).

Parity: reference `pointcept/datasets/preprocessing/sampling_chunking_data.py:17-60`:
grid-sample each scene then split it into overlapping chunk_range (e.g. 6x6 m)
BEV chunks with chunk_stride, writing each chunk as its own scene dir.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def chunking_scene(
    name,
    dataset_root,
    split,
    grid_size=None,
    chunk_range=(6, 6),
    chunk_stride=(3, 3),
    chunk_minimum_size=10000,
):
    print(f"chunking {name} in {split}")
    scene_dir = os.path.join(dataset_root, split, name)
    assets = {}
    for f in os.listdir(scene_dir):
        if f.endswith(".npy"):
            assets[f[:-4]] = np.load(os.path.join(scene_dir, f))
    coord = assets["coord"]

    if grid_size is not None:
        # hash-based grid sampling (same as GridSample train mode)
        from pointcept_tpu.datasets.transform import GridSample

        grid = np.floor(coord / grid_size).astype(np.int64)
        grid -= grid.min(0)
        key = GridSample.fnv_hash_vec(grid)
        idx_sort = np.argsort(key)
        _, inverse, count = np.unique(key[idx_sort], return_inverse=True, return_counts=True)
        idx_select = np.cumsum(np.insert(count, 0, 0)[:-1]) + np.random.randint(0, count.max(), count.size) % count
        keep = idx_sort[idx_select]
        assets = {k: v[keep] for k, v in assets.items() if len(v) == len(coord)}
        coord = assets["coord"]

    bev = coord[:, :2]
    lo = bev.min(0)
    hi = bev.max(0)
    x_starts = np.arange(lo[0], max(hi[0] - chunk_range[0], lo[0]) + chunk_stride[0], chunk_stride[0])
    y_starts = np.arange(lo[1], max(hi[1] - chunk_range[1], lo[1]) + chunk_stride[1], chunk_stride[1])
    chunk_idx = 0
    out_split = f"{split}_grid{grid_size}_chunk{chunk_range[0]}x{chunk_range[1]}_stride{chunk_stride[0]}x{chunk_stride[1]}"
    for xs in x_starts:
        for ys in y_starts:
            mask = (
                (bev[:, 0] >= xs)
                & (bev[:, 0] < xs + chunk_range[0])
                & (bev[:, 1] >= ys)
                & (bev[:, 1] < ys + chunk_range[1])
            )
            if mask.sum() < chunk_minimum_size:
                continue
            out_dir = os.path.join(dataset_root, out_split, f"{name}_{chunk_idx}")
            os.makedirs(out_dir, exist_ok=True)
            for k, v in assets.items():
                np.save(os.path.join(out_dir, f"{k}.npy"), v[mask])
            chunk_idx += 1
    return name


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--grid_size", type=float, default=None)
    parser.add_argument("--chunk_range", type=float, nargs=2, default=[6, 6])
    parser.add_argument("--chunk_stride", type=float, nargs=2, default=[3, 3])
    parser.add_argument("--chunk_minimum_size", type=int, default=10000)
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()

    names = sorted(os.listdir(os.path.join(args.dataset_root, args.split)))
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        list(
            pool.map(
                chunking_scene,
                names,
                [args.dataset_root] * len(names),
                [args.split] * len(names),
                [args.grid_size] * len(names),
                [tuple(args.chunk_range)] * len(names),
                [tuple(args.chunk_stride)] * len(names),
                [args.chunk_minimum_size] * len(names),
            )
        )


if __name__ == "__main__":
    main()
