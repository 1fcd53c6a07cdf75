"""S3DIS dataset (parity: reference `pointcept/datasets/s3dis.py`)."""

from pointcept_tpu.datasets.builder import DATASETS
from pointcept_tpu.datasets.defaults import DefaultDataset


@DATASETS.register_module()
class S3DISDataset(DefaultDataset):
    """Area-split S3DIS over preprocessed npy rooms; split e.g. ("Area_1", ...)."""
