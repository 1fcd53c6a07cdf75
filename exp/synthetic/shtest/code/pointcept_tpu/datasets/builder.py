"""DATASETS registry (parity: reference `pointcept/datasets/builder.py`)."""

from pointcept_tpu.utils.registry import Registry

DATASETS = Registry("datasets")


def build_dataset(cfg):
    return DATASETS.build(cfg)
