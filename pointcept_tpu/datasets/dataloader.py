"""Multi-dataset ratio-interleaved loading (PPT joint training).

Parity: reference `pointcept/datasets/dataloader.py:26` (`MultiDatasetDataloader`)
— one loader per sub-dataset of a ConcatDataset, interleaved according to each
sub-dataset's original `loop` value, so one epoch mixes datasets at the
configured ratios.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

from pointcept_tpu.datasets.defaults import ConcatDataset
from pointcept_tpu.datasets.loader import DataLoader
from pointcept_tpu.utils import comm
from pointcept_tpu.utils.logger import get_root_logger


class MultiDatasetDataloader:
    def __init__(
        self,
        concat_dataset: ConcatDataset,
        batch_size_per_gpu: int,
        num_worker_per_gpu: int,
        collate_fn: Optional[Callable] = None,
        seed: Optional[int] = None,
    ):
        self.datasets = concat_dataset.datasets
        self.ratios = [dataset.loop for dataset in self.datasets]
        # reset per-dataset loop to 1 (the interleave realizes the ratio)
        for dataset in self.datasets:
            dataset.loop = 1
        self.concat_dataset = concat_dataset
        self.dataset = concat_dataset  # trainer samples init batches from here
        self.batch_size = batch_size_per_gpu
        logger = get_root_logger()
        self.dataloaders = []
        for dataset_id, dataset in enumerate(self.datasets):
            self.dataloaders.append(
                DataLoader(
                    dataset,
                    batch_size=batch_size_per_gpu,
                    shuffle=True,
                    num_workers=num_worker_per_gpu,
                    collate_fn=collate_fn,
                    drop_last=True,
                    seed=(seed or 0) + dataset_id,
                )
            )
            logger.info(
                f"MultiDataset: sub-dataset {dataset_id} ({type(dataset).__name__}) "
                f"ratio {self.ratios[dataset_id]}, {len(dataset)} samples"
            )

    def set_epoch(self, epoch: int):
        for dl in self.dataloaders:
            dl.set_epoch(epoch)

    def __len__(self):
        return sum(len(dl) * ratio for dl, ratio in zip(self.dataloaders, self.ratios))

    def __iter__(self):
        iterators = [iter(dl) for dl in self.dataloaders]
        # interleave pattern: dataset i appears ratio_i times per round
        pattern = []
        for i, r in enumerate(self.ratios):
            pattern.extend([i] * r)
        exhausted = [False] * len(iterators)
        while not all(exhausted):
            for i in pattern:
                if exhausted[i]:
                    continue
                try:
                    yield next(iterators[i])
                except StopIteration:
                    exhausted[i] = True
