"""Synthetic point-cloud datasets for tests/benchmarks (no on-disk data needed).

Not in the reference (which assumes preprocessed datasets on disk); this
generates ScanNet-like indoor scenes — floor/wall planes plus furniture blobs —
deterministically per index, so the full train/eval pipeline can run and be
benchmarked anywhere.
"""

from __future__ import annotations

import numpy as np

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


def synthesize_scene(seed: int, num_points: int = 120000, num_classes: int = 20, extent: float = 8.0):
    rng = np.random.RandomState(seed)
    n_floor = num_points // 4
    n_wall = num_points // 4
    n_obj = num_points - n_floor - n_wall
    # floor
    floor = np.stack(
        [rng.uniform(0, extent, n_floor), rng.uniform(0, extent, n_floor), np.abs(rng.normal(0, 0.02, n_floor))],
        axis=1,
    )
    # two walls
    w1 = np.stack(
        [rng.uniform(0, extent, n_wall // 2), np.abs(rng.normal(0, 0.02, n_wall // 2)), rng.uniform(0, 3, n_wall // 2)],
        axis=1,
    )
    w2 = np.stack(
        [np.abs(rng.normal(0, 0.02, n_wall - n_wall // 2)), rng.uniform(0, extent, n_wall - n_wall // 2), rng.uniform(0, 3, n_wall - n_wall // 2)],
        axis=1,
    )
    # furniture: surface shells (boxes/ellipsoids), like real scanned objects —
    # volumetric gaussian blobs would give unrealistically sparse voxel
    # occupancy (real scans are 2-manifolds)
    n_blobs = rng.randint(5, 15)
    centers = rng.uniform(0.5, extent - 0.5, size=(n_blobs, 3))
    centers[:, 2] = rng.uniform(0.2, 1.5, n_blobs)
    sizes = rng.uniform(0.2, 1.0, size=(n_blobs, 3))
    blob_ids = rng.randint(0, n_blobs, n_obj)
    dirs = rng.normal(0, 1, (n_obj, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-9
    shell = dirs / np.maximum(np.abs(dirs), 1e-6).max(axis=1, keepdims=True)  # cube surface
    is_box = (blob_ids % 2)[:, None]
    surf = np.where(is_box, shell, dirs)  # half boxes, half ellipsoids
    objs = centers[blob_ids] + surf * sizes[blob_ids] * 0.5 + rng.normal(0, 0.004, (n_obj, 3))
    coord = np.concatenate([floor, w1, w2, objs]).astype(np.float32)

    seg = np.concatenate(
        [
            np.full(n_floor, 1),  # floor
            np.full(n_wall, 0),  # wall
            (blob_ids % (num_classes - 2)) + 2,
        ]
    ).astype(np.int32)
    inst = np.concatenate([np.full(n_floor, -1), np.full(n_wall, -1), blob_ids]).astype(np.int32)
    color = (rng.rand(len(coord), 3) * 55 + np.eye(3)[seg % 3] * 200).astype(np.float32)
    normal = rng.randn(len(coord), 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True) + 1e-9
    perm = rng.permutation(len(coord))
    return dict(coord=coord[perm], color=color[perm], normal=normal[perm], segment=seg[perm], instance=inst[perm])


@DATASETS.register_module()
class SyntheticSemSegDataset(DefaultDataset):
    def __init__(
        self,
        num_scenes=8,
        num_points=120000,
        num_classes=20,
        seed_offset=0,
        extent=8.0,
        **kwargs,
    ):
        self.num_scenes = num_scenes
        self.num_points = num_points
        self.num_classes = num_classes
        self.seed_offset = seed_offset
        self.extent = extent
        kwargs.setdefault("data_root", "/nonexistent")
        super().__init__(**kwargs)

    def get_data_list(self):
        return [f"synthetic_{self.split}_{i}" for i in range(self.num_scenes)]

    def get_data(self, idx):
        i = idx % len(self.data_list)
        data = synthesize_scene(
            self.seed_offset + i, self.num_points, self.num_classes, extent=self.extent
        )
        data["name"] = self.data_list[i]
        data["split"] = self.split
        return data

    def get_data_name(self, idx):
        return self.data_list[idx % len(self.data_list)]


@DATASETS.register_module()
class SyntheticClsDataset(DefaultDataset):
    """Per-cloud classification: gaussian-mixture shapes with a class-dependent layout."""

    def __init__(self, num_clouds=64, num_points=1024, num_classes=40, seed_offset=0, **kwargs):
        self.num_clouds = num_clouds
        self.num_points = num_points
        self.num_classes = num_classes
        self.seed_offset = seed_offset
        kwargs.setdefault("data_root", "/nonexistent")
        super().__init__(**kwargs)

    def get_data_list(self):
        return [f"cls_{self.split}_{i}" for i in range(self.num_clouds)]

    def get_data(self, idx):
        i = idx % len(self.data_list)
        rng = np.random.RandomState(self.seed_offset + i)
        category = i % self.num_classes
        # class-specific deterministic anchor layout + noise
        anchor_rng = np.random.RandomState(category)
        anchors = anchor_rng.uniform(-1, 1, size=(8, 3))
        a_ids = rng.randint(0, 8, self.num_points)
        coord = anchors[a_ids] + rng.normal(0, 0.1, (self.num_points, 3))
        coord = coord.astype(np.float32)
        normal = rng.randn(self.num_points, 3).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=1, keepdims=True) + 1e-9
        return dict(
            coord=coord,
            normal=normal,
            segment=np.full(self.num_points, -1, np.int32),
            category=np.array([category], np.int32),
            name=self.data_list[i],
            split=self.split,
        )

    def get_data_name(self, idx):
        return self.data_list[idx % len(self.data_list)]
