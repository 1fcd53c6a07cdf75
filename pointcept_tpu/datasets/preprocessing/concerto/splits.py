"""Splits-manifest CLI for every Concerto-exported dataset.

Parity: the reference carries one near-identical `splits.py` per dataset
(`concerto/{re10k,scannet,hm3d,waymo,arkitscenes,scannetpp,structured3d,
s3dis,cap3d,graspnet}/splits.py`) — all scan `<root>/images/<split>` and emit
`<root>/splits/<split>.json` manifests of {pointclouds, images,
correspondences}. One table-driven writer (`common.write_splits`) covers them;
dataset-specific split names are flags.

    python -m pointcept_tpu.datasets.preprocessing.concerto.splits \
        --dataset_root data/re10k_align --splits train test \
        [--rel_root data/re10k_align]
"""

from __future__ import annotations

import argparse

from pointcept_tpu.datasets.preprocessing.concerto.common import write_splits


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    parser.add_argument(
        "--rel_root",
        default=None,
        help="rewrite manifest paths relative to this prefix (reference "
        "hard-rewrites to data/<dataset>)",
    )
    parser.add_argument("--image_ext", default=".png")
    args = parser.parse_args()
    out = write_splits(
        args.dataset_root, tuple(args.splits), rel_root=args.rel_root, image_ext=args.image_ext
    )
    for split, manifest in out.items():
        print(f"{split}: {len(manifest)} scenes")


if __name__ == "__main__":
    main()
