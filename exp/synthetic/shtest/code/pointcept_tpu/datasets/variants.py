"""Small dataset variants.

Parity targets:
- `SemanticKITTIColorNormalDataset` / `WaymoColorNormalDataset` /
  `NuScenesColorNormalDataset` (reference semantic_kitti.py:154, waymo.py:111,
  nuscenes.py analog): outdoor scans exposed with zero color/normal
  placeholder fields so indoor-style (color, normal) feat pipelines run
  unchanged on lidar data.
- `ScanObjectNNHardestDataset` (scanobjectnn.py:330): the augmentedrot_scale75
  h5 split (our base ScanObjectNNDataset already reads those files).
- `HKDataset` (hk.py:35): folder-of-npy scenes.
- `Cap3DDataset` (cap3d.py:22): torch .pt object point clouds with
  view-consistent normal estimation (open3d's kNN-PCA normals -> numpy PCA).
- `PartNetDataDataset` (partnet.py:19): PLY point samples via our own reader.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset
from pointcept_tpu.datasets.nuscenes import NuScenesDataset
from pointcept_tpu.datasets.semantic_kitti import SemanticKITTIDataset
from pointcept_tpu.datasets.shapenet_part import ScanObjectNNDataset
from pointcept_tpu.datasets.waymo import WaymoDataset


def _radial_normals(points, center=np.array([0.0, 0.0, 0.0])):
    normals = points - center[None, :]
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(norms, 1e-12)


@DATASETS.register_module()
class SemanticKITTIColorNormalDataset(SemanticKITTIDataset):
    def get_data(self, idx):
        data_dict = super().get_data(idx)
        data_dict["color"] = np.zeros_like(data_dict["coord"])
        data_dict["normal"] = np.zeros_like(data_dict["coord"])
        return data_dict


@DATASETS.register_module()
class WaymoColorNormalDataset(WaymoDataset):
    def get_data(self, idx):
        data_dict = super().get_data(idx)
        data_dict["color"] = np.zeros_like(data_dict["coord"])
        data_dict["normal"] = np.zeros_like(data_dict["coord"])
        return data_dict


@DATASETS.register_module()
class NuScenesColorNormalDataset(NuScenesDataset):
    def get_data(self, idx):
        data_dict = super().get_data(idx)
        data_dict["color"] = np.zeros_like(data_dict["coord"])
        data_dict["normal"] = np.zeros_like(data_dict["coord"])
        return data_dict


@DATASETS.register_module()
class ScanObjectNNHardestDataset(ScanObjectNNDataset):
    """Augmentedrot_scale75 h5 variant (the base class already targets it)."""


@DATASETS.register_module()
class HKDataset(DefaultDataset):
    """Hong Kong urban scenes: folder-of-npy layout (reference hk.py:35)."""

    VALID_ASSETS = ("coord", "color", "normal", "segment", "instance", "strength")

    def __init__(self, crop_h=630, crop_w=1120, patch_size=14, if_img=False, **kwargs):
        self.crop_h, self.crop_w, self.patch_size, self.if_img = crop_h, crop_w, patch_size, if_img
        super().__init__(**kwargs)

    def get_data(self, idx):
        data_path = self.data_list[idx % len(self.data_list)]
        data_dict = {"name": self.get_data_name(idx)}
        for asset in os.listdir(data_path):
            if asset.endswith(".npy") and asset[:-4] in self.VALID_ASSETS:
                data_dict[asset[:-4]] = np.load(os.path.join(data_path, asset))
        n = data_dict["coord"].shape[0]
        data_dict["coord"] = data_dict["coord"].astype(np.float32)
        for k in ("color", "normal"):
            if k in data_dict:
                data_dict[k] = data_dict[k].astype(np.float32)
        if "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape(-1).astype(np.int32)
        else:
            data_dict["segment"] = np.full(n, -1, np.int32)
        return data_dict


def estimate_pca_normals(coord, k=16, center=np.array([0.0, 0.0, 0.0])):
    """kNN-PCA normals, flipped toward the view center (cap3d.py:36-51)."""
    n = coord.shape[0]
    k = min(k, n)
    d2 = ((coord[:, None, :] - coord[None, :, :]) ** 2).sum(-1) if n <= 4096 else None
    if d2 is None:
        # chunked kNN for larger clouds
        idx = np.empty((n, k), np.int64)
        for s in range(0, n, 2048):
            e = min(s + 2048, n)
            dd = ((coord[s:e, None, :] - coord[None, :, :]) ** 2).sum(-1)
            idx[s:e] = np.argpartition(dd, k - 1, axis=1)[:, :k]
    else:
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
    nbr = coord[idx]  # [n, k, 3]
    centered = nbr - nbr.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    _w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]  # smallest eigenvector
    view = _radial_normals(coord, center)
    flip = (normals * view).sum(-1) < 0
    normals[flip] = -normals[flip]
    return normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)


@DATASETS.register_module()
class Cap3DDataset(DefaultDataset):
    """Cap3D objects stored as torch .pt tensors (reference cap3d.py:22)."""

    def __init__(self, data_num=None, **kwargs):
        super().__init__(**kwargs)
        if data_num:
            self.data_list = self.data_list[:data_num]

    def get_data_list(self):
        return sorted(glob.glob(os.path.join(self.data_root, self.split, "*.pt")))

    def get_data(self, idx):
        import torch

        path = self.data_list[idx % len(self.data_list)]
        pts = torch.load(path, map_location="cpu", weights_only=True)
        pts = np.asarray(pts, np.float32)
        if pts.shape[0] in (3, 6) and pts.shape[1] > 16:
            pts = pts.T
        coord = pts[:, :3]
        color = pts[:, 3:6] if pts.shape[1] >= 6 else np.zeros_like(coord)
        normal = estimate_pca_normals(coord)
        n = coord.shape[0]
        return dict(
            coord=coord, color=color.astype(np.float32), normal=normal.astype(np.float32),
            segment=np.full(n, -1, np.int32),
            name=os.path.splitext(os.path.basename(path))[0],
        )


@DATASETS.register_module()
class PartNetDataDataset(DefaultDataset):
    """PartNet raw point samples (PLY) for pretraining (reference partnet.py:19)."""

    def __init__(self, if_img=False, crop_h=630, crop_w=1120, patch_size=14, **kwargs):
        self.if_img = if_img
        self.crop_h, self.crop_w, self.patch_size = crop_h, crop_w, patch_size
        super().__init__(**kwargs)

    def get_data(self, idx):
        from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply

        data_path = self.data_list[idx % len(self.data_list)]
        pc_path = os.path.join(data_path, "point_sample", "sample-points-all-pts-nor-rgba-10000.ply")
        coord, color, extras, _faces = read_scene_ply(pc_path)
        n = coord.shape[0]
        normal = np.stack(
            [extras.get(k, np.zeros(n, np.float32)) for k in ("nx", "ny", "nz")], axis=1
        )
        return dict(
            coord=coord.astype(np.float32),
            color=(color if color is not None else np.zeros_like(coord)).astype(np.float32),
            normal=normal.astype(np.float32),
            segment=np.full(n, -1, np.int32),
            name=self.get_data_name(idx),
        )
