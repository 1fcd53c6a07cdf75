"""Multiprocess prefetching DataLoader (native, no torch dependency).

Replaces torch.utils.data.DataLoader in the reference trainer
(`pointcept/engines/train.py:284-315`). Workers execute
dataset[idx] + collate in subprocesses and stream ordered batches back through
a queue; `num_workers=0` degrades to synchronous iteration. Supports per-epoch
reshuffling (`set_epoch`) and per-worker numpy seeding (parity with reference
`engines/defaults.py:46-59` worker seeding).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import random
import traceback
from typing import Callable, List, Optional

import numpy as np


def _worker_loop(dataset, collate_fn, task_q, result_q, base_seed, worker_id):
    while True:
        task = task_q.get()
        if task is None:
            break
        batch_idx, indices, epoch = task
        seed = (base_seed + epoch * 7919 + batch_idx) % (2**31)
        np.random.seed(seed)
        random.seed(seed)
        try:
            samples = [dataset[i] for i in indices]
            batch = collate_fn(samples) if collate_fn is not None else samples
            result_q.put((batch_idx, batch, None))
        except Exception:
            result_q.put((batch_idx, None, traceback.format_exc()))


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = False,
        seed: Optional[int] = None,
        prefetch: int = 4,
        sampler=None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.seed = seed if seed is not None else 0
        self.prefetch = prefetch
        self.sampler = sampler
        # Multi-host sharding (reference DistributedSampler semantics,
        # `engines/train.py:284-315`): each host strides the shared shuffled
        # index list so per-host batches are disjoint. `batch_size` is the
        # PER-HOST batch size.
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self._workers: List[mp.Process] = []
        self._task_q = None
        self._result_q = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _shard(self, indices: List[int]) -> List[int]:
        if self.process_count == 1:
            return indices
        # equalize per-host counts (pad by wrapping, like DistributedSampler)
        per_host = (len(indices) + self.process_count - 1) // self.process_count
        total = per_host * self.process_count
        if total > len(indices):
            indices = indices + indices[: total - len(indices)]
        return indices[self.process_index :: self.process_count]

    def _index_batches(self) -> List[List[int]]:
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        else:
            indices = list(range(len(self.dataset)))
            if self.shuffle:
                rng = np.random.RandomState((self.seed + self.epoch) % 2**31)
                rng.shuffle(indices)
        indices = self._shard(indices)
        batches = [indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self):
        n = len(self.dataset) if self.sampler is None else len(self.sampler)
        n = (n + self.process_count - 1) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers == 0:
            for bi, idxs in enumerate(batches):
                seed = (self.seed + self.epoch * 7919 + bi) % (2**31)
                np.random.seed(seed)
                random.seed(seed)
                samples = [self.dataset[i] for i in idxs]
                yield self.collate_fn(samples) if self.collate_fn is not None else samples
            return
        yield from self._parallel_iter(batches)

    def _parallel_iter(self, batches):
        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=max(self.prefetch, self.num_workers))
        workers = []
        for w in range(self.num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self.collate_fn, task_q, result_q, self.seed, w),
                daemon=True,
            )
            p.start()
            workers.append(p)
        try:
            for bi, idxs in enumerate(batches):
                task_q.put((bi, idxs, self.epoch))
            for _ in range(self.num_workers):
                task_q.put(None)
            # reorder buffer for deterministic order
            buffered = {}
            next_idx = 0
            received = 0
            while received < len(batches):
                bi, batch, err = result_q.get()
                received += 1
                if err is not None:
                    raise RuntimeError(f"DataLoader worker failed:\n{err}")
                buffered[bi] = batch
                while next_idx in buffered:
                    yield buffered.pop(next_idx)
                    next_idx += 1
        finally:
            for p in workers:
                if p.is_alive():
                    p.terminate()
            for p in workers:
                p.join(timeout=1)


class DistributedImbalancedSampler:
    """Caps one sub-dataset of a ConcatDataset at `sampled_dataset_limit`
    samples per epoch (parity: reference `datasets/dataloader.py:118`).

    Iterates indices of a ConcatDataset where dataset `sampled_dataset_id`
    contributes at most `sampled_dataset_limit` randomly chosen samples.
    """

    def __init__(self, dataset, sampled_dataset_id=0, sampled_dataset_limit=1000, shuffle=True, seed=0):
        self.dataset = dataset
        self.sampled_dataset_id = sampled_dataset_id
        self.sampled_dataset_limit = sampled_dataset_limit
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        data_list = self.dataset.data_list
        rng = np.random.RandomState((self.seed + self.epoch) % 2**31)
        limited = [i for i, (d, _) in enumerate(data_list) if d == self.sampled_dataset_id]
        others = [i for i, (d, _) in enumerate(data_list) if d != self.sampled_dataset_id]
        if len(limited) > self.sampled_dataset_limit:
            limited = rng.choice(limited, self.sampled_dataset_limit, replace=False).tolist()
        indices = others + limited
        if self.shuffle:
            rng.shuffle(indices)
        return indices

    def __iter__(self):
        return iter(self._indices())

    def __len__(self):
        data_list = self.dataset.data_list
        n_lim = sum(1 for d, _ in data_list if d == self.sampled_dataset_id)
        return len(data_list) - max(0, n_lim - self.sampled_dataset_limit)
