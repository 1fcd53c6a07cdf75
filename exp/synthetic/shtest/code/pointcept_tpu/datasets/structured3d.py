"""Structured3D dataset (parity: reference `pointcept/datasets/structure3d.py`)."""

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


@DATASETS.register_module()
class Structured3DDataset(DefaultDataset):
    """Preprocessed npy rooms; split dirs may be lists (scene_00000 ... shards)."""
