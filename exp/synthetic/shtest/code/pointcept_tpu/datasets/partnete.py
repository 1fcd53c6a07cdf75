"""PartNetE (PartNet-Ensembled) dataset.

Parity: reference `pointcept/datasets/partnete.py` — category-conditioned part
segmentation (PartSLIP benchmark): per-category part label blocks laid out
globally via `num_part_offset`, with part 0 of each category = "other"; raw
per-object folders of npy assets under `<data_root>/<split>/<category>/<id>/`.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Sequence

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset

VALID_ASSETS = ("coord", "color", "normal", "segment", "instance")


@DATASETS.register_module()
class PartNetEDataset(DefaultDataset):
    def __init__(self, class_names, num_parts, data_root, meta_path, split, **kwargs):
        self.categories = list(class_names)
        self.num_parts = list(num_parts)
        self.num_part_offset = np.concatenate(([0], np.cumsum(self.num_parts)))
        self.category2part = {}
        self.parts = []
        meta_data = {}
        if meta_path and os.path.isfile(meta_path):
            with open(meta_path, "r", encoding="utf-8") as f:
                meta_data = json.load(f)
        for class_id, class_name in enumerate(self.categories):
            self.category2part[class_name] = (
                self.num_part_offset[class_id] + np.arange(self.num_parts[class_id])
            ).tolist()
            part_names = ["other"] + list(meta_data.get(class_name, []))
            self.parts.extend(f"{class_name}_{p}" for p in part_names)
        super().__init__(data_root=data_root, split=split, **kwargs)

    def get_data_list(self):
        if isinstance(self.split, str):
            return sorted(glob.glob(os.path.join(self.data_root, self.split, "*/*")))
        data_list = []
        for split in self.split:
            data_list += sorted(glob.glob(os.path.join(self.data_root, split, "*/*")))
        return data_list

    def get_data_name(self, idx):
        file_path = self.data_list[idx % len(self.data_list)]
        dir_path, id_name = os.path.split(file_path)
        return f"{os.path.basename(dir_path)}_{id_name}"

    def get_data(self, idx):
        data_path = self.data_list[idx % len(self.data_list)]
        name = self.get_data_name(idx)
        data_dict = {}
        for asset in os.listdir(data_path):
            if asset.endswith(".npy") and asset[:-4] in VALID_ASSETS:
                data_dict[asset[:-4]] = np.load(os.path.join(data_path, asset))
        data_dict["name"] = name
        object_name = name.split("_")[0]
        cls_token = self.categories.index(object_name)
        data_dict["cls_token"] = cls_token
        for k in ("coord", "color", "normal"):
            if k in data_dict:
                data_dict[k] = data_dict[k].astype(np.float32)
        n = data_dict["coord"].shape[0]
        if "segment" in data_dict:
            # local part id -> global part index (+1: part 0 is "other")
            data_dict["segment"] = (
                data_dict["segment"].reshape(-1).astype(np.int32)
                + self.num_part_offset[cls_token]
                + 1
            )
        else:
            data_dict["segment"] = np.full(n, -1, np.int32)
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape(-1).astype(np.int32)
        else:
            data_dict["instance"] = np.full(n, -1, np.int32)
        return data_dict
