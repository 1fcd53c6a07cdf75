"""Create a Waymo semantic-segmentation benchmark submission.

Parity: reference `tools/create_waymo_semseg_submission.py` — packs the
per-frame `*_pred.npy` results written by SemSegTester back into Waymo
range-image protos (both lidar returns of the TOP laser), zlib-compresses
them, and serializes a `SemanticSegmentationSubmission` bin.

Requires the `waymo-open-dataset` toolkit (conflicting TF pin — the reference
also runs this detached from the training env):

  python tools/create_waymo_semseg_submission.py \
      --record_path <save_path>/result --dataset_path data/waymo \
      --split validation
"""

import argparse
import os
import zlib

import numpy as np


def compress_array(array: np.ndarray, open_dataset, is_int32: bool = False):
    m = open_dataset.MatrixInt32() if is_int32 else open_dataset.MatrixFloat()
    m.shape.dims.extend(list(array.shape))
    m.data.extend(array.reshape([-1]).tolist())
    return zlib.compress(m.SerializeToString())


def main():
    import waymo_open_dataset.dataset_pb2 as open_dataset
    from waymo_open_dataset.protos import segmentation_metrics_pb2
    from waymo_open_dataset.protos import segmentation_submission_pb2

    parser = argparse.ArgumentParser()
    parser.add_argument("--record_path", required=True, help="dir of *_pred.npy from SemSegTester")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--split", required=True, choices=["validation", "testing"])
    parser.add_argument("--account_name", default="***")
    parser.add_argument("--method_name", default="pointcept_tpu")
    args = parser.parse_args()

    submission = segmentation_submission_pb2.SemanticSegmentationSubmission()
    frames = segmentation_metrics_pb2.SegmentationFrameList()
    files = [f for f in os.listdir(args.record_path) if f.endswith("_pred.npy")]
    for file in sorted(files):
        context_name, ts = file.strip("segment-*_pred.npy").split("_with_camera_labels_")
        # predictions are 0-based learned classes; Waymo ids reserve 0=UNLABELED
        pred = np.load(os.path.join(args.record_path, file)) + 1
        masks = np.load(
            os.path.join(
                args.dataset_path, args.split,
                f"segment-{context_name}_with_camera_labels", ts, "mask.npy",
            ),
            allow_pickle=True,
        )
        offset = np.cumsum([m.sum() for m in masks.reshape(-1)])
        parts = np.split(pred[: offset[-1]], offset[:-1])
        lbl = open_dataset.Laser()
        lbl.name = open_dataset.LaserName.TOP
        for ri, (part, mask) in enumerate(((parts[0], masks[0, 0]), (parts[5], masks[1, 0]))):
            mask = np.expand_dims(mask, -1)
            range_pred = np.zeros_like(mask, np.int32)
            range_pred[mask] = part
            range_pred = np.concatenate([np.zeros_like(mask, np.int32), range_pred], -1)
            target = lbl.ri_return1 if ri == 0 else lbl.ri_return2
            target.segmentation_label_compressed = compress_array(range_pred, open_dataset, True)
        frame = segmentation_metrics_pb2.SegmentationFrame()
        frame.segmentation_labels.append(lbl)
        frame.context_name = context_name
        frame.frame_timestamp_micros = int(ts)
        frames.frames.append(frame)
        print(file)

    submission.account_name = args.account_name
    submission.unique_method_name = args.method_name
    submission.authors.append(args.account_name)
    submission.affiliation = "***"
    submission.method_link = "***"
    submission.sensor_type = segmentation_submission_pb2.SemanticSegmentationSubmission.LIDAR_ALL
    submission.number_past_frames_exclude_current = 0
    submission.number_future_frames_exclude_current = 0
    submission.inference_results.CopyFrom(frames)
    out = os.path.join(args.record_path, "submission.bin")
    with open(out, "wb") as f:
        f.write(submission.SerializeToString())
    print(f"submission -> {out}")


if __name__ == "__main__":
    main()
