"""ShapeNetPart dataset (parity: reference `pointcept/datasets/shapenet_part.py`).

Part segmentation over 16 categories / 50 parts; reads the
`shapenetcore_partanno_segmentation_benchmark_v0_normal` txt layout.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


@DATASETS.register_module()
class ShapeNetPartDataset(DefaultDataset):
    # category -> part label range (standard benchmark mapping)
    categories = [
        "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar", "Knife",
        "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket", "Skateboard", "Table",
    ]
    category2part = {
        "Airplane": [0, 1, 2, 3], "Bag": [4, 5], "Cap": [6, 7], "Car": [8, 9, 10, 11],
        "Chair": [12, 13, 14, 15], "Earphone": [16, 17, 18], "Guitar": [19, 20, 21],
        "Knife": [22, 23], "Lamp": [24, 25, 26, 27], "Laptop": [28, 29],
        "Motorbike": [30, 31, 32, 33, 34, 35], "Mug": [36, 37], "Pistol": [38, 39, 40],
        "Rocket": [41, 42, 43], "Skateboard": [44, 45, 46], "Table": [47, 48, 49],
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.synset2category = {}
        cat_file = os.path.join(self.data_root, "synsetoffset2category.txt")
        if os.path.isfile(cat_file):
            for line in open(cat_file):
                name, synset = line.strip().split()
                self.synset2category[synset] = name

    def get_data_list(self):
        split_file = os.path.join(
            self.data_root, "train_test_split", f"shuffled_{self.split}_file_list.json"
        )
        if not os.path.isfile(split_file):
            return []
        with open(split_file) as f:
            entries = json.load(f)
        return [os.path.join(self.data_root, *e.split("/")[1:]) + ".txt" for e in entries]

    def get_data(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        raw = np.loadtxt(path).astype(np.float32)
        synset = os.path.basename(os.path.dirname(path))
        category = self.synset2category.get(synset, synset)
        cat_idx = self.categories.index(category) if category in self.categories else 0
        return dict(
            coord=raw[:, :3],
            normal=raw[:, 3:6],
            segment=raw[:, 6].astype(np.int32),
            category=np.array([cat_idx], np.int32),
            name=os.path.splitext(os.path.basename(path))[0],
            split=self.split,
        )

    def get_data_name(self, idx):
        return os.path.splitext(os.path.basename(self.data_list[idx % len(self.data_list)]))[0]


@DATASETS.register_module()
class ScanObjectNNDataset(DefaultDataset):
    """ScanObjectNN classification (parity: reference `pointcept/datasets/scanobjectnn.py`).

    Reads the h5 main_split files when h5py is available; otherwise npy dirs.
    """

    def __init__(self, variant="main_split", **kwargs):
        self.variant = variant
        self._points = None
        self._labels = None
        super().__init__(**kwargs)

    def get_data_list(self):
        try:
            import h5py  # noqa
        except ImportError:
            return []
        fname = "training_objectdataset_augmentedrot_scale75.h5" if self.split == "train" else "test_objectdataset_augmentedrot_scale75.h5"
        path = os.path.join(self.data_root, self.variant, fname)
        if not os.path.isfile(path):
            return []
        import h5py

        with h5py.File(path, "r") as f:
            self._points = np.asarray(f["data"]).astype(np.float32)
            self._labels = np.asarray(f["label"]).astype(np.int32)
        return list(range(len(self._labels)))

    def get_data(self, idx):
        i = self.data_list[idx % len(self.data_list)]
        return dict(
            coord=self._points[i],
            segment=np.full(self._points[i].shape[0], -1, np.int32),
            category=np.array([self._labels[i]], np.int32),
            name=f"{self.split}_{i}",
            split=self.split,
        )

    def get_data_name(self, idx):
        return f"{self.split}_{self.data_list[idx % len(self.data_list)]}"


@DATASETS.register_module()
class ScanObjectNNRawDataset(DefaultDataset):
    """Raw ScanObjectNN object .bin files (reference `scanobjectnn.py:25`).

    Layout: `data_root/<split>/<class>/<obj>.bin` where each file packs
    [num_points, x y z nx ny nz r g b instance segment] as float32 (auxiliary
    `*_part.bin` / `*_indices.bin` files are skipped). Coordinates/normals are
    rotated from the capture frame (y-up) to z-up. The ImagePoint fields are
    emitted empty so the Concerto-style collate path accepts the samples.
    """

    # y-up capture frame -> z-up
    _ROT = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], np.float32)

    def __init__(self, if_img=True, crop_h=518, crop_w=518, patch_size=14, **kwargs):
        self.if_img = if_img
        self.patch_h = crop_h // patch_size
        self.patch_w = crop_w // patch_size
        self.patch_size = patch_size
        super().__init__(**kwargs)

    def get_data_list(self):
        import glob as _glob

        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        files = []
        for split in splits:
            root = os.path.join(self.data_root, split)
            found = _glob.glob(os.path.join(root, "*", "*.bin"))
            files += [
                p for p in found
                if not p.endswith("_part.bin") and not p.endswith("_indices.bin")
            ]
        return sorted(files)

    def get_data(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        raw = np.fromfile(path, dtype=np.float32)
        n = int(raw[0])
        body = raw[1:]
        assert body.size == n * 11, (
            f"corrupt ScanObjectNN object {path}: {body.size} floats for {n} points"
        )
        pts = body.reshape(n, 11)
        data = dict(
            coord=np.ascontiguousarray(pts[:, :3] @ self._ROT.T, np.float32),
            normal=np.ascontiguousarray(pts[:, 3:6] @ self._ROT.T, np.float32),
            color=pts[:, 6:9].astype(np.float32),
            instance=pts[:, 9].astype(np.int32),
            segment=pts[:, 10].astype(np.int32),
            name=os.path.splitext(os.path.basename(path))[0],
        )
        if self.if_img:
            h = self.patch_h * self.patch_size
            w = self.patch_w * self.patch_size
            data["images"] = np.zeros((0, 3, h, w), np.float32)
            data["img_num"] = np.array([0], np.int32)
            data["correspondence"] = np.full((n, 0, 2), -1.0, np.float32)
        return data
