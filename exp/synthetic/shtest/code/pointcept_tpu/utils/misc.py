"""Small metric helpers (AverageMeter, intersection/union counting).

Parity target: reference `pointcept/utils/misc.py:16,38`.
"""

from __future__ import annotations

import os
from collections import abc
from typing import Optional

import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def intersection_and_union(output, target, K: int, ignore_index: int = -1):
    """Per-class intersection / union / target histograms (numpy).

    output/target: int arrays of equal shape; returns (area_intersection,
    area_union, area_target), each shape [K]. Parity with reference
    `utils/misc.py:38`.
    """
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1).copy()
    assert output.shape == target.shape
    output[np.where(target == ignore_index)[0]] = ignore_index
    intersection = output[np.where(output == target)[0]]
    area_intersection, _ = np.histogram(intersection, bins=np.arange(K + 1))
    area_output, _ = np.histogram(output, bins=np.arange(K + 1))
    area_target, _ = np.histogram(target, bins=np.arange(K + 1))
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def make_dirs(path: str):
    os.makedirs(path, exist_ok=True)


def is_seq_of(seq, expected_type, seq_type=None) -> bool:
    exp_seq_type = abc.Sequence if seq_type is None else seq_type
    if not isinstance(seq, exp_seq_type):
        return False
    return all(isinstance(item, expected_type) for item in seq)


def is_list_of(seq, expected_type) -> bool:
    return is_seq_of(seq, expected_type, seq_type=list)


def is_tuple_of(seq, expected_type) -> bool:
    return is_seq_of(seq, expected_type, seq_type=tuple)


class DummyClass:
    """Placeholder for optional dependencies (parity with reference `utils/misc.py`)."""

    def __init__(self, *args, **kwargs):
        raise RuntimeError("This component's optional dependency is unavailable in this build")
