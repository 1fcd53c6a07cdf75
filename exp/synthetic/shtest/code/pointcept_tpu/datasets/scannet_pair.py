"""ScanNet RGB-D frame pairs for PointContrast-style pretraining.

Parity: reference `pointcept/datasets/scannet_pair.py`: each sample is a pair of
partial scans with >30% overlap; the two frames become view1/view2 for
contrastive learning.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset
from pointcept_tpu.datasets.transform import Compose


@DATASETS.register_module()
class ScanNetPairDataset(DefaultDataset):
    def __init__(self, overlap_threshold=0.3, view1_transform=None, view2_transform=None, **kwargs):
        self.overlap_threshold = overlap_threshold
        self.view1_transform = Compose(view1_transform)
        self.view2_transform = Compose(view2_transform)
        super().__init__(**kwargs)

    def get_data_list(self):
        data_list = []
        for overlap_file in glob.glob(
            os.path.join(self.data_root, "*", "pcd", "overlap.txt")
        ):
            with open(overlap_file) as f:
                for line in f:
                    info = line.strip().split()
                    if len(info) == 3 and float(info[2]) > self.overlap_threshold:
                        data_list.append(
                            (
                                os.path.join(os.path.dirname(overlap_file), info[0]),
                                os.path.join(os.path.dirname(overlap_file), info[1]),
                            )
                        )
        return data_list

    def get_data(self, idx):
        pair = self.data_list[idx % len(self.data_list)]
        view1 = dict(np.load(pair[0]))
        view2 = dict(np.load(pair[1]))
        view1 = self.view1_transform(view1)
        view2 = self.view2_transform(view2)
        data = {}
        for key, value in view1.items():
            data[f"view1_{key}"] = value
        for key, value in view2.items():
            data[f"view2_{key}"] = value
        data["name"] = os.path.basename(pair[0])
        return data

    def get_data_name(self, idx):
        return os.path.basename(self.data_list[idx % len(self.data_list)][0])


@DATASETS.register_module()
class HM3DDataset(DefaultDataset):
    """Habitat-Matterport 3D scenes (parity: reference `pointcept/datasets/hm3d.py`)."""


@DATASETS.register_module()
class MatterportDataset(DefaultDataset):
    """Matterport3D regions (generic npy layout; reference uses DefaultDataset too)."""


@DATASETS.register_module()
class AEODataset(DefaultDataset):
    """ARKitScenes/AEO scenes (parity: reference `pointcept/datasets/aeo.py`)."""
