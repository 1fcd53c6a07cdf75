"""ModelNet40 dataset (parity: reference `pointcept/datasets/modelnet.py`).

Reads the `modelnet40_normal_resampled` layout: per-sample txt point lists with
normals, split files `modelnet40_{split}.txt`, category list
`modelnet40_shape_names.txt`. Caches whole splits as .npz records.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset
from pointcept_tpu.utils.logger import get_root_logger


@DATASETS.register_module()
class ModelNetDataset(DefaultDataset):
    def __init__(
        self,
        num_points: int = 8192,
        uniform_sampling: bool = True,
        save_record: bool = True,
        class_names_file: str = "modelnet40_shape_names.txt",
        **kwargs,
    ):
        self.num_points = num_points
        self.uniform_sampling = uniform_sampling
        self.save_record = save_record
        self.class_names_file = class_names_file
        self.categories = None
        super().__init__(**kwargs)
        names_path = osp.join(self.data_root, self.class_names_file)
        if osp.isfile(names_path):
            self.categories = [line.strip() for line in open(names_path)]

    def get_data_list(self):
        split_file = osp.join(self.data_root, f"modelnet40_{self.split}.txt")
        if not osp.isfile(split_file):
            return []
        return [line.strip() for line in open(split_file)]

    def get_data(self, idx):
        name = self.data_list[idx % len(self.data_list)]
        category = "_".join(name.split("_")[:-1])
        path = osp.join(self.data_root, category, name + ".txt")
        raw = np.loadtxt(path, delimiter=",").astype(np.float32)
        if self.num_points is not None and raw.shape[0] > self.num_points:
            if self.uniform_sampling:
                # reference runs pointops.farthest_point_sampling on the full
                # cloud (`modelnet.py:100`); host FPS here, deterministic per
                # sample (seed = stable hash of the name) so records cache
                # reproducibly
                from pointcept_tpu.ops.pointops import fps_numpy

                seed = int.from_bytes(name.encode()[-4:].rjust(4, b"\0"), "little")
                sel = fps_numpy(raw[:, :3], self.num_points, seed=seed)
                raw = raw[sel]
            else:
                raw = raw[: self.num_points]
        cat_idx = self.categories.index(category) if self.categories else 0
        return dict(
            coord=raw[:, :3],
            normal=raw[:, 3:6],
            segment=np.full(raw.shape[0], -1, np.int32),
            category=np.array([cat_idx], np.int32),
            name=name,
            split=self.split,
        )

    def get_data_name(self, idx):
        return self.data_list[idx % len(self.data_list)]
