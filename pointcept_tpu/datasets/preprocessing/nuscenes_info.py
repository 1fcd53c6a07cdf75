"""nuScenes lidarseg info builder.

Parity: reference `pointcept/datasets/preprocessing/nuscenes/
preprocess_nuscenes_info.py` — builds per-split pickle lists consumed by
`NuScenesDataset` (`{lidar_path, token, gt_segment_path}` relative to the raw
root). This compact rebuild targets the SEMANTIC SEGMENTATION pipeline: the
reference's detection-box annotations and multi-sweep pose chains are omitted
because `datasets/nuscenes.py` reads only the keyframe lidar + lidarseg labels.

Requires the `nuscenes-devkit` (not bundled in this image — run wherever the
devkit and the raw dataset live):

  python -m pointcept_tpu.datasets.preprocessing.nuscenes_info \
      --dataset_root <nuscenes_raw> --output_root data/nuscenes \
      --max_sweeps 10
"""

from __future__ import annotations

import argparse
import os
import pickle
from pathlib import Path


CAM_CHANNELS = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def quat_to_mat(q) -> "np.ndarray":
    """nuScenes [w, x, y, z] quaternion -> [3, 3] rotation matrix."""
    import numpy as np

    w, x, y, z = (float(v) for v in q)
    n = max(np.sqrt(w * w + x * x + y * y + z * z), 1e-12)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def sensor_to_lidar(nusc, sensor_token, l2e_t, l2e_r, e2g_t, e2g_r, sensor_type):
    """Camera sweep info incl. sensor->Top-LiDAR RT (Concerto reference
    `concerto/nuscenes/preprocess_nuscenes_info.py:250-308`: points map as
    `points @ R + T` from the sensor frame into the keyframe lidar frame,
    chained sensor->ego'->global->ego->lidar)."""
    import numpy as np

    sd = nusc.get("sample_data", sensor_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    sweep = {
        "data_path": str(nusc.get_sample_data_path(sd["token"])),
        "type": sensor_type,
        "sample_data_token": sd["token"],
        "sensor2ego_translation": cs["translation"],
        "sensor2ego_rotation": cs["rotation"],
        "ego2global_translation": pose["translation"],
        "ego2global_rotation": pose["rotation"],
        "timestamp": sd["timestamp"],
    }
    l2e_r_mat, e2g_r_mat = quat_to_mat(l2e_r), quat_to_mat(e2g_r)
    l2e_r_s_mat = quat_to_mat(cs["rotation"])
    e2g_r_s_mat = quat_to_mat(pose["rotation"])
    l2e_t = np.asarray(l2e_t).reshape(1, 3)
    e2g_t = np.asarray(e2g_t).reshape(1, 3)
    l2e_t_s = np.asarray(cs["translation"]).reshape(1, 3)
    e2g_t_s = np.asarray(pose["translation"]).reshape(1, 3)
    back = np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    r = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ back
    t = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ back
    t = t - (e2g_t @ back + l2e_t @ np.linalg.inv(l2e_r_mat).T)
    sweep["sensor2lidar_rotation"] = r.T
    sweep["sensor2lidar_translation"] = t.reshape(3)
    if sensor_type.startswith("CAM"):
        import numpy as np

        sweep["camera_intrinsics"] = np.asarray(cs["camera_intrinsic"])
    return sweep


def build_split_infos(nusc, data_path, scene_names, with_gt=True, with_camera=False):
    infos = []
    scene_tokens = {s["token"] for s in nusc.scene if s["name"] in scene_names}
    for sample in nusc.sample:
        if sample["scene_token"] not in scene_tokens:
            continue
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = nusc.get("sample_data", lidar_token)
        lidar_path = Path(nusc.get_sample_data_path(lidar_token))
        if not lidar_path.exists():
            continue
        info = {
            "token": sample["token"],
            "lidar_token": lidar_token,
            "lidar_path": str(lidar_path.relative_to(data_path)),
            "timestamp": sd["timestamp"],
        }
        if with_gt:
            seg = nusc.get("lidarseg", lidar_token)
            info["gt_segment_path"] = seg["filename"]
        if with_camera:
            # Concerto image-point training needs each keyframe's 6 cameras
            # with sensor->lidar RT + intrinsics (reference fill_trainval_infos
            # with_camera=True, `concerto/nuscenes/...:362-388`)
            cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            info["cams"] = {
                cam: sensor_to_lidar(
                    nusc, sample["data"][cam],
                    cs["translation"], cs["rotation"],
                    pose["translation"], pose["rotation"], cam,
                )
                for cam in CAM_CHANNELS
                if cam in sample["data"]
            }
        infos.append(info)
    return infos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--version", default="v1.0-trainval")
    parser.add_argument("--max_sweeps", type=int, default=10, help="naming parity with the reference info files")
    parser.add_argument(
        "--with_camera", action="store_true",
        help="add per-keyframe 6-camera sensor->lidar RT + intrinsics (Concerto)",
    )
    args = parser.parse_args()

    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=args.version, dataroot=args.dataset_root, verbose=True)
    out = Path(args.output_root) / "info"
    out.mkdir(parents=True, exist_ok=True)
    if args.version == "v1.0-test":
        groups = {"test": (splits.test, False)}
    else:
        groups = {"train": (splits.train, True), "val": (splits.val, True)}
    for split, (scene_names, with_gt) in groups.items():
        infos = build_split_infos(
            nusc, args.dataset_root, set(scene_names), with_gt,
            with_camera=args.with_camera,
        )
        path = out / f"nuscenes_infos_{args.max_sweeps}sweeps_{split}.pkl"
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        print(f"{split}: {len(infos)} samples -> {path}")


if __name__ == "__main__":
    main()
