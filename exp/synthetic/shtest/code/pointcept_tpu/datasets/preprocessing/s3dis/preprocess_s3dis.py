"""S3DIS raw -> npy preprocessing.

Parity: reference `pointcept/datasets/preprocessing/s3dis/preprocess_s3dis.py`:
reads Stanford3dDataset Area_*/room/Annotations/*.txt, emits per-room dirs of
coord/color/segment/instance npy arrays.
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]


def process_room(room_dir: str, output_root: str):
    area = os.path.basename(os.path.dirname(room_dir))
    room = os.path.basename(room_dir)
    coords, colors, segments, instances = [], [], [], []
    ann_files = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    for inst_id, ann in enumerate(ann_files):
        cls = os.path.basename(ann).split("_")[0]
        label = CLASS_NAMES.index(cls) if cls in CLASS_NAMES else CLASS_NAMES.index("clutter")
        data = np.loadtxt(ann)
        coords.append(data[:, :3].astype(np.float32))
        colors.append(data[:, 3:6].astype(np.float32))
        segments.append(np.full(data.shape[0], label, np.int16))
        instances.append(np.full(data.shape[0], inst_id, np.int16))
    if not coords:
        return None
    out_dir = os.path.join(output_root, area, room)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "coord.npy"), np.concatenate(coords))
    np.save(os.path.join(out_dir, "color.npy"), np.concatenate(colors))
    np.save(os.path.join(out_dir, "segment.npy"), np.concatenate(segments))
    np.save(os.path.join(out_dir, "instance.npy"), np.concatenate(instances))
    return f"{area}/{room}"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True, help="Stanford3dDataset_v1.2_Aligned_Version")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()

    rooms = [
        d for d in glob.glob(os.path.join(args.dataset_root, "Area_*", "*"))
        if os.path.isdir(os.path.join(d, "Annotations"))
    ]
    with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
        for name in pool.map(process_room, rooms, [args.output_root] * len(rooms)):
            if name:
                print(f"processed {name}")


if __name__ == "__main__":
    main()
