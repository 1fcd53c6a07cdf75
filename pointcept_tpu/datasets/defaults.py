"""DefaultDataset: directory-of-.npy scenes + transform pipeline.

Parity: reference `pointcept/datasets/defaults.py:34-199`. A scene is a
directory ``data_root/split/<scene>/`` holding ``coord.npy`` (float32 [N,3]) and
optional ``color/normal/strength/segment/instance`` arrays. Train path applies
the transform pipeline; test path builds the TTA fragment list
(aug_transforms x GridSample(mode="test") voxel subsets, each post-transformed).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from collections.abc import Sequence
from copy import deepcopy

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.transform import TRANSFORMS, Compose
from pointcept_tpu.utils.logger import get_root_logger

VALID_ASSETS = [
    "coord",
    "color",
    "normal",
    "strength",
    "segment",
    "instance",
    "pose",
    "superpoint",
]


@DATASETS.register_module()
class DefaultDataset:
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
        extra_transform=None,
    ):
        self.data_root = data_root
        self.split = split
        # extra_transform splices into the inherited pipeline — lets variant
        # configs (e.g. the nocolor/nonormal probe ablations) add a transform
        # without restating the whole base list. Inserted before the terminal
        # Collect (which packs per-key arrays into `feat` and drops the keys).
        if extra_transform:
            transform = list(transform or [])
            cut = next(
                (i for i, t in enumerate(transform) if dict(t).get("type") == "Collect"),
                len(transform),
            )
            transform = transform[:cut] + list(extra_transform) + transform[cut:]
        self.extra_transform = extra_transform
        self.transform = Compose(transform)
        self.cache = cache
        self.ignore_index = ignore_index
        self.loop = loop if not test_mode else 1  # force 1 for test
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self._cache_store = {}

        if test_mode:
            self.test_voxelize = TRANSFORMS.build(dict(self.test_cfg["voxelize"])) if self.test_cfg.get("voxelize") else None
            self.test_crop = TRANSFORMS.build(dict(self.test_cfg["crop"])) if self.test_cfg.get("crop") else None
            # extra_transform is already spliced into the main transform above
            # (test pipelines have no Collect, so it lands at the end and runs
            # once per sample before fragmenting); do NOT also prepend it to
            # post_transform or non-idempotent transforms would compound per
            # fragment.
            post = list(self.test_cfg.get("post_transform") or [])
            self.post_transform = Compose(post)
            self.aug_transform = [Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])]

        self.data_list = self.get_data_list()
        logger = get_root_logger()
        logger.info(
            "Totally {} x {} samples in {} set.".format(len(self.data_list), self.loop, split)
        )

    def get_data_list(self):
        if isinstance(self.split, str):
            return sorted(glob.glob(osp.join(self.data_root, self.split, "*")))
        if isinstance(self.split, Sequence):
            out = []
            for split in self.split:
                out += sorted(glob.glob(osp.join(self.data_root, split, "*")))
            return out
        raise NotImplementedError

    def get_data(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        if self.cache and path in self._cache_store:
            return deepcopy(self._cache_store[path])
        name = self.get_data_name(idx)
        split = self.get_split_name(idx)
        data_dict = dict(name=name, split=split)
        for asset in os.listdir(path) if osp.isdir(path) else []:
            if not asset.endswith(".npy"):
                continue
            key = asset[: -len(".npy")]
            if key not in VALID_ASSETS:
                continue
            data_dict[key] = np.load(osp.join(path, asset))
        if "coord" in data_dict:
            data_dict["coord"] = data_dict["coord"].astype(np.float32)
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"].astype(np.float32)
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"].astype(np.float32)
        if "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape([-1]).astype(np.int32)
        else:
            data_dict["segment"] = np.ones(data_dict["coord"].shape[0], dtype=np.int32) * -1
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape([-1]).astype(np.int32)
        else:
            data_dict["instance"] = np.ones(data_dict["coord"].shape[0], dtype=np.int32) * -1
        if self.cache:
            self._cache_store[path] = deepcopy(data_dict)
        return data_dict

    def get_data_name(self, idx):
        return osp.basename(self.data_list[idx % len(self.data_list)])

    def get_split_name(self, idx):
        return osp.basename(osp.dirname(self.data_list[idx % len(self.data_list)]))

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        """Build the fragment list for precise eval (reference `:159-190`)."""
        data_dict = self.get_data(idx)
        data_dict = self.transform(data_dict)
        result_dict = dict(segment=data_dict.pop("segment"), name=data_dict.pop("name"))
        if "origin_segment" in data_dict:
            assert "inverse" in data_dict
            result_dict["origin_segment"] = data_dict.pop("origin_segment")
            result_dict["inverse"] = data_dict.pop("inverse")

        data_dict_list = []
        for aug in self.aug_transform:
            data_dict_list.append(aug(deepcopy(data_dict)))

        fragment_list = []
        for data in data_dict_list:
            if self.test_voxelize is not None:
                data_part_list = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                data_part_list = [data]
            for data_part in data_part_list:
                if self.test_crop is not None:
                    data_part = self.test_crop(data_part)
                else:
                    data_part = [data_part]
                fragment_list += data_part

        for i in range(len(fragment_list)):
            fragment_list[i] = self.post_transform(fragment_list[i])
        result_dict["fragment_list"] = fragment_list
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation of sub-datasets (reference `defaults.py:640-676`)."""

    def __init__(self, datasets, loop=1):
        from pointcept_tpu.datasets.builder import build_dataset

        self.datasets = [build_dataset(dict(d)) for d in datasets]
        self.loop = loop
        self.data_list = self.get_data_list()

    def get_data_list(self):
        data_list = []
        for i, dataset in enumerate(self.datasets):
            data_list.extend(zip(np.ones(len(dataset), dtype=int) * i, np.arange(len(dataset))))
        return data_list

    def get_data(self, idx):
        dataset_idx, data_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[dataset_idx][data_idx]

    def __getitem__(self, idx):
        return self.get_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop
