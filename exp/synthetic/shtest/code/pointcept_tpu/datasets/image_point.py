"""Point cloud + posed-image datasets (Concerto 2D-3D data).

Parity: reference `pointcept/datasets/defaults.py:203-478`
(`DefaultImagePointDataset`): manifest-driven scenes of point-cloud npy assets
plus RGB images and per-image point-pixel correspondence tables. Images are
center-cropped to the patch aspect ratio and resized to
(patch_h * patch_size, patch_w * patch_size); correspondences are remapped into
PATCH units (the reference divides by `_alignment == patch_size`,
`resize_correspondence_info:281-306`) and densified into
``correspondence [N, num_images, 2]`` float arrays with -1 padding.

`DefaultMultiViewImagePointDataset` (reference :478-636) back-projects posed
depth maps into the point cloud with exact pixel correspondences.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from copy import deepcopy

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.transform import TRANSFORMS, Compose
from pointcept_tpu.utils.logger import get_root_logger

PC_VALID_ASSETS = ("coord", "color", "normal", "superpoint", "pose", "segment", "instance", "strength")


@DATASETS.register_module()
class DefaultImagePointDataset:
    def __init__(
        self,
        split="train",
        data_root="data/dataset",
        transform=None,
        test_mode=False,
        test_cfg=None,
        cache=False,
        ignore_index=-1,
        loop=1,
        crop_h=630,
        crop_w=1120,
        patch_size=14,
        interpolation="bilinear",
        if_img=True,
    ):
        self.if_img = if_img
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.ignore_index = ignore_index
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        if test_mode:
            self.test_voxelize = TRANSFORMS.build(self.test_cfg.voxelize)
            self.test_crop = TRANSFORMS.build(self.test_cfg.crop) if self.test_cfg.get("crop") else None
            self.post_transform = Compose(self.test_cfg.post_transform)
            self.aug_transform = [Compose(aug) for aug in self.test_cfg.aug_transform]

        self.crop_h, self.crop_w = crop_h, crop_w
        self.patch_size = patch_size
        self.patch_h = crop_h // patch_size
        self.patch_w = crop_w // patch_size
        self.data_list, self.split_list = self.get_data_list()
        self.data_name = list(self.data_list.keys())
        get_root_logger().info(
            f"Totally {len(self.data_name)} x {self.loop} samples in "
            f"{os.path.basename(self.data_root)} {split} set."
        )

    def get_data_list(self):
        split_list = {}
        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        data_list = {}
        for split in splits:
            path = os.path.join(self.data_root, "splits", f"{split}.json")
            with open(path, "r", encoding="utf-8") as f:
                part = json.load(f)
            data_list.update(part)
            split_list[split] = list(part.keys())
        return data_list, split_list

    def get_data_name(self, idx):
        return self.data_name[idx % len(self.data_name)]

    def _load_images(self, paths):
        from PIL import Image

        target_h = self.patch_h * self.patch_size
        target_w = self.patch_w * self.patch_size
        imgs, crops, sizes = [], [], []
        for p in paths:
            img = Image.open(p).convert("RGB")
            w, h = img.size
            div = max(min(w // self.patch_w, h // self.patch_h), 1)
            cw, ch = div * self.patch_w, div * self.patch_h
            left, top = (w - cw) // 2, (h - ch) // 2
            img = img.crop((left, top, left + cw, top + ch)).resize(
                (target_w, target_h), Image.BILINEAR
            )
            arr = np.asarray(img, np.float32) / 255.0  # [H, W, 3]
            imgs.append(np.moveaxis(arr, -1, 0))
            crops.append((left, top, left + cw, top + ch))
            sizes.append((h, w))
        stack = (
            np.stack(imgs) if imgs else np.zeros((0, 3, target_h, target_w), np.float32)
        )
        return stack, crops, sizes

    def _remap_correspondence(self, corr, crop, alignment):
        """[M, 3] (x_pixel, y_pixel, point_idx) -> (patch_row, patch_col, idx)."""
        left, top, right, bottom = crop
        crop_h, crop_w = bottom - top, right - left
        h = self.patch_h * self.patch_size
        w = self.patch_w * self.patch_size
        ok = (corr[:, 1] >= top) & (corr[:, 1] < bottom) & (corr[:, 0] >= left) & (corr[:, 0] < right)
        corr = corr[ok].astype(np.float32)
        corr[:, 1] = (corr[:, 1] - top) * h / crop_h / alignment
        corr[:, 0] = (corr[:, 0] - left) * w / crop_w / alignment
        return corr[:, [1, 0, 2]]

    def get_data(self, idx):
        name = self.get_data_name(idx)
        entry = self.data_list[name]
        data_dict = {"name": name}
        pc_path = entry["pointclouds"]
        for asset in os.listdir(pc_path):
            if asset.endswith(".npy") and asset[:-4] in PC_VALID_ASSETS:
                data_dict[asset[:-4]] = np.load(os.path.join(pc_path, asset))
        n = data_dict["coord"].shape[0]
        if self.if_img:
            images, crops, sizes = self._load_images(entry.get("images", []))
            data_dict["images"] = images
            data_dict["img_num"] = np.array([images.shape[0]], np.int32)
            corr_paths = entry.get("correspondences", [])
            corr_all = np.full((n, len(corr_paths), 2), -1.0, np.float32)
            for i, cp in enumerate(corr_paths):
                info = np.load(cp).astype(np.float32)
                if np.array_equal(info, -np.ones((1, 3))) or i >= len(crops):
                    continue
                info = self._remap_correspondence(info, crops[i], self.patch_size)
                corr_all[info[:, -1].astype(np.int32), i, :] = info[:, :2]
            data_dict["correspondence"] = corr_all
        data_dict["coord"] = data_dict["coord"].astype(np.float32)
        for k in ("color", "normal"):
            if k in data_dict:
                data_dict[k] = data_dict[k].astype(np.float32)
        if "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape(-1).astype(np.int32)
        else:
            data_dict["segment"] = np.full(n, self.ignore_index, np.int32)
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape(-1).astype(np.int32)
        else:
            data_dict["instance"] = np.full(n, -1, np.int32)
        return data_dict

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        data_dict = self.transform(self.get_data(idx))
        result = dict(segment=data_dict.pop("segment"), name=data_dict.pop("name"))
        if "origin_segment" in data_dict:
            result["origin_segment"] = data_dict.pop("origin_segment")
            result["inverse"] = data_dict.pop("inverse")
        fragment_list = []
        for aug in self.aug_transform:
            data = aug(deepcopy(data_dict))
            parts = self.test_voxelize(data) if self.test_voxelize else [dict(data, index=np.arange(data["coord"].shape[0]))]
            for part in parts:
                part = self.test_crop(part) if self.test_crop else [part]
                fragment_list += part
        result["fragment_list"] = [self.post_transform(f) for f in fragment_list]
        return result

    def __getitem__(self, idx):
        return self.prepare_test_data(idx) if self.test_mode else self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_name) * self.loop


@DATASETS.register_module()
class DefaultMultiViewImagePointDataset(DefaultImagePointDataset):
    """Multi-view RGB-D scenes (reference defaults.py:478-636): the point cloud
    is BUILT by back-projecting each depth map through its intrinsics/pose
    (valid depths in (0, 0.8m] of the depth_scale'd map), colors come from the
    RGB pixels, normals are view directions from the origin, and the pixel
    correspondences are exact by construction."""

    def __init__(self, depth_scale=1000.0, **kwargs):
        self.depth_scale = depth_scale
        super().__init__(**kwargs)

    @staticmethod
    def _view_normals(coord, center=np.zeros(3)):
        n = coord - center[None, :]
        return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    def get_data(self, idx):
        from PIL import Image

        name = self.get_data_name(idx)
        entry = self.data_list[name]
        pts, cols, corrs = [], [], []
        coord_num = 0
        for i in range(len(entry["images"])):
            try:
                with Image.open(entry["images"][i]) as img:
                    color_img = np.asarray(img.convert("RGB"))
                with Image.open(entry["depths"][i]) as img:
                    depth_img = np.asarray(img)
                pose = np.load(entry["Ts"][i])
                intr = np.load(entry["Ks"][i])
            except FileNotFoundError:
                continue
            depth_m = depth_img.astype(np.float32) / self.depth_scale
            h, w = depth_m.shape
            fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]
            v, u = np.indices((h, w))
            ok = (depth_m > 0) & (depth_m < 0.8)
            z = depth_m[ok]
            x = (u[ok] - cx) * z / fx
            y = (v[ok] - cy) * z / fy
            cam = np.stack([x, y, z], axis=1)
            world = (pose @ np.concatenate([cam, np.ones((len(cam), 1))], 1).T).T[:, :3]
            pts.append(world)
            cols.append(color_img[ok])
            pix = np.stack([u[ok], v[ok], np.arange(len(cam)) + coord_num], axis=1)
            coord_num += len(cam)
            corrs.append(pix)
        coord = np.concatenate(pts, 0) if pts else np.zeros((0, 3))
        coord[:, 2] = -coord[:, 2]
        color = np.concatenate(cols, 0) if cols else np.zeros((0, 3))
        normal = self._view_normals(coord)

        data_dict = {
            "name": name,
            "coord": coord.astype(np.float32),
            "color": color.astype(np.float32),
            "normal": normal.astype(np.float32),
            "segment": np.full(coord.shape[0], self.ignore_index, np.int32),
        }
        if self.if_img:
            images, crops, sizes = self._load_images(entry.get("images", []))
            data_dict["images"] = images
            data_dict["img_num"] = np.array([images.shape[0]], np.int32)
            corr_all = np.full((coord.shape[0], len(corrs), 2), -1.0, np.float32)
            for i, pix in enumerate(corrs):
                info = self._remap_correspondence(pix.astype(np.float32), crops[i], self.patch_size)
                corr_all[info[:, -1].astype(np.int32), i, :] = info[:, :2]
            data_dict["correspondence"] = corr_all
        return data_dict
