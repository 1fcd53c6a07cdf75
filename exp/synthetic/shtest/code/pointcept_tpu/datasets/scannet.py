"""ScanNet v2 dataset (20 & 200 class variants).

Parity: reference `pointcept/datasets/scannet.py:28,109` — DefaultDataset over
preprocessed npy scenes with `segment20`/`segment200` label files and optional
data-efficient `sampled_index` (la/lr series).
"""

from __future__ import annotations

import os
import os.path as osp
from copy import deepcopy

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


@DATASETS.register_module()
class ScanNetDataset(DefaultDataset):
    VALID_ASSETS = [
        "coord",
        "color",
        "normal",
        "segment20",
        "instance",
    ]

    class2id = np.array(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
    )

    def __init__(self, lr_file=None, la_file=None, **kwargs):
        self.lr = np.loadtxt(lr_file, dtype=str) if lr_file is not None else None
        self.la = np.load(la_file, allow_pickle=True).item() if la_file is not None else None
        super().__init__(**kwargs)

    def get_data_list(self):
        if self.lr is None:
            return super().get_data_list()
        return [osp.join(self.data_root, "train", name) for name in self.lr]

    def get_data(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        if self.cache and path in self._cache_store:
            return deepcopy(self._cache_store[path])
        name = self.get_data_name(idx)
        split = self.get_split_name(idx)
        data_dict = dict(name=name, split=split)
        assets = os.listdir(path) if osp.isdir(path) else []
        for asset in assets:
            if not asset.endswith(".npy"):
                continue
            key = asset[: -len(".npy")]
            if key not in self.VALID_ASSETS:
                continue
            data_dict[key] = np.load(osp.join(path, asset))
        data_dict["coord"] = data_dict["coord"].astype(np.float32)
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"].astype(np.float32)
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"].astype(np.float32)
        if "segment20" in data_dict:
            data_dict["segment"] = data_dict.pop("segment20").reshape([-1]).astype(np.int32)
        elif "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape([-1]).astype(np.int32)
        else:
            data_dict["segment"] = np.ones(data_dict["coord"].shape[0], dtype=np.int32) * -1
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape([-1]).astype(np.int32)
        else:
            data_dict["instance"] = np.ones(data_dict["coord"].shape[0], dtype=np.int32) * -1
        if self.la:
            sampled_index = self.la[self.get_data_name(idx)]
            mask = np.ones_like(data_dict["segment"], dtype=bool)
            mask[sampled_index] = False
            data_dict["segment"][mask] = self.ignore_index
            data_dict["sampled_index"] = sampled_index
        if self.cache:
            self._cache_store[path] = deepcopy(data_dict)
        return data_dict


@DATASETS.register_module()
class ScanNet200Dataset(ScanNetDataset):
    VALID_ASSETS = [
        "coord",
        "color",
        "normal",
        "segment200",
        "instance",
    ]

    def get_data(self, idx):
        data_dict = super().get_data(idx)
        if "segment200" in data_dict:
            data_dict["segment"] = data_dict.pop("segment200").reshape([-1]).astype(np.int32)
        return data_dict


@DATASETS.register_module()
class ScanNetPPDataset(DefaultDataset):
    """ScanNet++ (reference `pointcept/datasets/scannetpp.py`)."""

    VALID_ASSETS = ["coord", "color", "normal", "segment", "instance"]
