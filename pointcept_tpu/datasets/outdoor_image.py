"""LiDAR + camera ImagePoint datasets (outdoor Concerto/Utonia data).

Parity: reference `pointcept/datasets/nuscenes.py:173`
(`NuScenesImagePointDataset`), `semantic_kitti.py:188`
(`SemanticKITTIImagePointDataset`), `waymo.py:205` (`WaymoImagePointDataset`),
`cap3d.py:90` (`Cap3DImagePointDataset`). Each pairs the lidar-only dataset's
point loading with posed camera images and point->pixel correspondences built
by projecting the scan through each camera's (intrinsic, lidar->cam) pair.

Correspondences follow the DefaultImagePointDataset contract
(`datasets/image_point.py`): ``correspondence [N, num_images, 2]`` float patch
coordinates, -1 where a point is not visible in that image.
"""

from __future__ import annotations

import os

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.image_point import DefaultImagePointDataset
from pointcept_tpu.datasets.nuscenes import NuScenesDataset
from pointcept_tpu.datasets.semantic_kitti import SemanticKITTIDataset
from pointcept_tpu.datasets.waymo import WaymoDataset


def project_lidar_to_image(coord, image_hw, cam_intrinsic, lidar_to_cam):
    """Project [N, 3] lidar-frame points through one camera.

    Returns (uv [N, 2] float pixel coords, visible [N] bool): points behind
    the camera or outside the image get visible=False (uv value undefined).
    Reference: `NuScenesImagePointDataset.project_lidar_to_image_with_color`
    (`datasets/nuscenes.py:204`).
    """
    n = coord.shape[0]
    hom = np.concatenate([coord[:, :3], np.ones((n, 1), coord.dtype)], axis=1)
    cam = hom @ lidar_to_cam.T  # [N, 4]
    z = cam[:, 2]
    front = z > 1e-6
    zs = np.where(front, z, 1.0)
    pix = (cam[:, :3] / zs[:, None]) @ cam_intrinsic.T  # [N, 3]
    u, v = pix[:, 0], pix[:, 1]
    h, w = image_hw
    visible = front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return np.stack([u, v], axis=1), visible


class LidarImagePointBase(DefaultImagePointDataset):
    """Shared machinery: the lidar dataset supplies points, `camera_views`
    supplies (image_path, intrinsic 3x3, lidar->cam 4x4) triples, and this
    class assembles images + dense correspondences."""

    # subclasses bind the lidar-only dataset class
    LIDAR_DATASET = None

    def __init__(self, img_num=None, if_img=True, **kwargs):
        self.img_num = img_num
        # the lidar dataset handles data_list / labels; reuse it wholesale
        lidar_keys = dict(kwargs)
        for k in ("crop_h", "crop_w", "patch_size", "interpolation"):
            lidar_keys.pop(k, None)
        self._lidar = self.LIDAR_DATASET(**lidar_keys)
        super().__init__(if_img=if_img, **kwargs)

    # -- data list comes from the lidar dataset ---------------------------
    def get_data_list(self):
        # DefaultImagePointDataset's manifest format doesn't apply here
        return {}, {}

    def __len__(self):
        return len(self._lidar)

    def get_data_name(self, idx):
        return self._lidar.get_data_name(idx)

    def camera_views(self, idx):
        """-> list of (image_path, intrinsic [3,3], lidar_to_cam [4,4])."""
        raise NotImplementedError

    def get_data(self, idx):
        data_dict = self._lidar.get_data(idx)
        if not self.if_img:
            return data_dict
        views = self.camera_views(idx)
        if self.img_num is not None:
            views = views[: self.img_num]
        views = [v for v in views if os.path.exists(v[0])]
        images, crops, sizes = self._load_images([v[0] for v in views])
        n = data_dict["coord"].shape[0]
        corr_all = np.full((n, len(views), 2), -1.0, np.float32)
        for i, (path, intr, l2c) in enumerate(views):
            uv, visible = project_lidar_to_image(
                data_dict["coord"], sizes[i], np.asarray(intr), np.asarray(l2c)
            )
            idxs = np.flatnonzero(visible)
            if idxs.size == 0:
                continue
            info = np.concatenate(
                [uv[idxs], idxs[:, None].astype(np.float32)], axis=1
            )  # [M, 3] (u, v, point)
            info = self._remap_correspondence(info, crops[i], self.patch_size)
            corr_all[info[:, -1].astype(np.int32), i, :] = info[:, :2]
        data_dict["images"] = images
        data_dict["img_num"] = np.array([images.shape[0]], np.int32)
        data_dict["correspondence"] = corr_all
        return data_dict


@DATASETS.register_module()
class NuScenesImagePointDataset(LidarImagePointBase):
    """Reference `datasets/nuscenes.py:173`: the 6 surround cameras from the
    preprocessed info pickles (`cams` entry per sweep)."""

    LIDAR_DATASET = NuScenesDataset
    CAMERA_TYPES = (
        "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
        "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
    )

    def camera_views(self, idx):
        info = self._lidar.data_list[idx % len(self._lidar.data_list)]
        cams = info.get("cams", {})
        views = []
        for cam in self.CAMERA_TYPES:
            if cam not in cams:
                continue
            c = cams[cam]
            path = os.path.join(self._lidar.data_root, "raw", c["data_path"])
            intr = np.asarray(c["cam_intrinsic"], np.float64)
            if "lidar_to_cam" in c:
                l2c = np.asarray(c["lidar_to_cam"], np.float64)
            else:
                # info stores sensor->lidar; invert rigid transform
                r = np.asarray(c["sensor2lidar_rotation"], np.float64)
                t = np.asarray(c["sensor2lidar_translation"], np.float64)
                l2c = np.eye(4)
                l2c[:3, :3] = r.T
                l2c[:3, 3] = -r.T @ t
            views.append((path, intr, l2c))
        return views


@DATASETS.register_module()
class SemanticKITTIImagePointDataset(LidarImagePointBase):
    """Reference `datasets/semantic_kitti.py:188`: stereo cameras 2/3 with
    calibration from each sequence's `calib.txt` (P2/P3 + Tr)."""

    LIDAR_DATASET = SemanticKITTIDataset
    CAMERA_TYPES = (2, 3)

    @staticmethod
    def read_calib(path):
        out = {}
        with open(path) as f:
            for line in f:
                if ":" not in line:
                    continue
                key, vals = line.split(":", 1)
                out[key.strip()] = np.array([float(x) for x in vals.split()])
        return out

    def camera_views(self, idx):
        scan_path = self._lidar.data_list[idx % len(self._lidar.data_list)]
        seq_dir = os.path.dirname(os.path.dirname(scan_path))
        frame = os.path.basename(scan_path).replace(".bin", ".png")
        calib_path = os.path.join(seq_dir, "calib.txt")
        if not os.path.exists(calib_path):
            return []
        calib = self.read_calib(calib_path)
        tr = np.eye(4)
        tr[:3, :4] = calib["Tr"].reshape(3, 4)  # velodyne -> cam0
        views = []
        for cam in self.CAMERA_TYPES:
            key = f"P{cam}"
            if key not in calib:
                continue
            p = calib[key].reshape(3, 4)
            intr = p[:, :3]
            # P includes the cam0->camN baseline: fold it into the extrinsic
            shift = np.eye(4)
            shift[:3, 3] = np.linalg.inv(intr) @ p[:, 3]
            l2c = shift @ tr
            views.append(
                (os.path.join(seq_dir, f"image_{cam}", frame), intr, l2c)
            )
        return views


@DATASETS.register_module()
class WaymoImagePointDataset(LidarImagePointBase):
    """Reference `datasets/waymo.py:205`: preprocessed frames carry image
    files + per-camera `intrinsic_{i}.npy` / `lidar_to_cam_{i}.npy`."""

    LIDAR_DATASET = WaymoDataset

    def camera_views(self, idx):
        frame_dir = self._lidar.data_list[idx % len(self._lidar.data_list)]
        views = []
        for i in range(5):  # waymo's 5 cameras
            img = os.path.join(frame_dir, f"image_{i}.jpg")
            intr = os.path.join(frame_dir, f"intrinsic_{i}.npy")
            l2c = os.path.join(frame_dir, f"lidar_to_cam_{i}.npy")
            if os.path.exists(img) and os.path.exists(intr) and os.path.exists(l2c):
                views.append((img, np.load(intr), np.load(l2c)))
        return views


@DATASETS.register_module()
class Cap3DImagePointDataset(DefaultImagePointDataset):
    """Reference `datasets/cap3d.py:90`: rendered object views with
    manifest-listed correspondences — the DefaultImagePointDataset contract
    already covers it; only the point-cloud asset layout differs (single
    packed npy per object)."""

    def get_data(self, idx):
        name = self.get_data_name(idx)
        entry = self.data_list[name]
        packed = np.load(entry["pointclouds"]) if isinstance(entry["pointclouds"], str) and entry["pointclouds"].endswith(".npy") else None
        if packed is not None:
            coord = packed[:, :3].astype(np.float32)
            color = (packed[:, 3:6] if packed.shape[1] >= 6 else np.zeros_like(coord)).astype(np.float32)
            data_dict = {
                "name": name,
                "coord": coord,
                "color": color,
                "segment": np.full(coord.shape[0], self.ignore_index, np.int32),
                "instance": np.full(coord.shape[0], -1, np.int32),
            }
            if self.if_img:
                images, crops, sizes = self._load_images(entry.get("images", []))
                data_dict["images"] = images
                data_dict["img_num"] = np.array([images.shape[0]], np.int32)
                corr_paths = entry.get("correspondences", [])
                corr_all = np.full((coord.shape[0], len(corr_paths), 2), -1.0, np.float32)
                for i, cp in enumerate(corr_paths):
                    info = np.load(cp).astype(np.float32)
                    if np.array_equal(info, -np.ones((1, 3))) or i >= len(crops):
                        continue
                    info = self._remap_correspondence(info, crops[i], self.patch_size)
                    corr_all[info[:, -1].astype(np.int32), i, :] = info[:, :2]
                data_dict["correspondence"] = corr_all
            return data_dict
        return super().get_data(idx)
