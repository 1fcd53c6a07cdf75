"""nuScenes lidarseg dataset (parity: reference `pointcept/datasets/nuscenes.py:23`).

Reads the preprocessed info-pkl layout produced by
`preprocessing/nuscenes/preprocess_nuscenes_info.py`; 16-class mapping is the
standard nuScenes lidarseg spec.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


@DATASETS.register_module()
class NuScenesDataset(DefaultDataset):
    def __init__(self, sweeps=10, ignore_index=-1, **kwargs):
        self.sweeps = sweeps
        self.ignore_index = ignore_index
        self.learning_map = self.get_learning_map(ignore_index)
        self.learning_map_inv = self.get_learning_map_inv(ignore_index)
        kwargs.pop("ignore_index", None)
        super().__init__(ignore_index=ignore_index, **kwargs)

    def get_info_path(self, split):
        assert split in ["train", "val", "test"]
        if split == "train":
            return os.path.join(self.data_root, "info", f"nuscenes_infos_{self.sweeps}sweeps_train.pkl")
        if split == "val":
            return os.path.join(self.data_root, "info", f"nuscenes_infos_{self.sweeps}sweeps_val.pkl")
        return os.path.join(self.data_root, "info", f"nuscenes_infos_{self.sweeps}sweeps_test.pkl")

    def get_data_list(self):
        if isinstance(self.split, str):
            splits = [self.split]
        else:
            splits = self.split
        data_list = []
        for split in splits:
            info_path = self.get_info_path(split)
            if not os.path.isfile(info_path):
                continue
            with open(info_path, "rb") as f:
                data_list += pickle.load(f)
        return data_list

    def get_data(self, idx):
        data = self.data_list[idx % len(self.data_list)]
        lidar_path = os.path.join(self.data_root, "raw", data["lidar_path"])
        points = np.fromfile(str(lidar_path), dtype=np.float32, count=-1).reshape([-1, 5])
        coord = points[:, :3]
        strength = points[:, 3].reshape([-1, 1]) / 255  # scale strength to [0, 1]
        if "gt_segment_path" in data:
            gt_segment_path = os.path.join(self.data_root, "raw", data["gt_segment_path"])
            segment = np.fromfile(str(gt_segment_path), dtype=np.uint8, count=-1).reshape([-1])
            segment = np.vectorize(self.learning_map.__getitem__)(segment).astype(np.int32)
        else:
            segment = np.full(coord.shape[0], self.ignore_index, dtype=np.int32)
        return dict(coord=coord, strength=strength, segment=segment, name=self.get_data_name(idx))

    def get_data_name(self, idx):
        data = self.data_list[idx % len(self.data_list)]
        return os.path.basename(data["lidar_path"]).split(".")[0]

    @staticmethod
    def get_learning_map(ignore_index):
        # standard nuScenes lidarseg 16-class mapping (dataset spec)
        return {
            0: ignore_index, 1: ignore_index, 2: 6, 3: 6, 4: 6, 5: ignore_index,
            6: 6, 7: ignore_index, 8: ignore_index, 9: 0, 10: ignore_index, 11: ignore_index,
            12: 7, 13: ignore_index, 14: 1, 15: 2, 16: 2, 17: 3, 18: 4,
            19: ignore_index, 20: ignore_index, 21: 5, 22: 8, 23: 9, 24: 10,
            25: 11, 26: 12, 27: 13, 28: 14, 29: ignore_index, 30: 15, 31: ignore_index,
        }

    @staticmethod
    def get_learning_map_inv(ignore_index):
        # learned class -> canonical nuScenes lidarseg category id (for submission)
        return {
            ignore_index: 0, 0: 9, 1: 14, 2: 15, 3: 17, 4: 18, 5: 21, 6: 2,
            7: 12, 8: 22, 9: 23, 10: 24, 11: 25, 12: 26, 13: 27, 14: 28, 15: 30,
        }
