"""Aggregate S3DIS 6-fold cross-validation results.

Parity: reference `tools/test_s3dis_6fold.py`: gathers the per-area
intersection/union/target records written by SemSegTester (result/*.npz here)
and reports the 6-fold mIoU/mAcc/allAcc.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--record-root", required=True, help="dir containing Area_*/results record .npz files")
    parser.add_argument("--num-classes", type=int, default=13)
    args = parser.parse_args()

    records = glob.glob(os.path.join(args.record_root, "*", "record.npz")) + glob.glob(
        os.path.join(args.record_root, "record_*.npz")
    )
    assert records, f"no record files under {args.record_root}"
    inter = np.zeros(args.num_classes)
    union = np.zeros(args.num_classes)
    target = np.zeros(args.num_classes)
    for rec in sorted(records):
        data = np.load(rec)
        inter += data["intersection"]
        union += data["union"]
        target += data["target"]
        print(f"{rec}: mIoU {np.mean(data['intersection'] / (data['union'] + 1e-10)):.4f}")
    iou_class = inter / (union + 1e-10)
    acc_class = inter / (target + 1e-10)
    print(
        "6-fold result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}".format(
            np.mean(iou_class), np.mean(acc_class), inter.sum() / (target.sum() + 1e-10)
        )
    )
    for i in range(args.num_classes):
        print(f"Class_{i}: iou {iou_class[i]:.4f} acc {acc_class[i]:.4f}")


if __name__ == "__main__":
    main()
