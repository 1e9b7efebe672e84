"""Input pipeline: ratio-mixed multi-dataset iteration with background
prefetch to device.

Capability-parity with the reference loader wrappers (reference:
my_affectgpt/datasets/datasets/dataloader_utils.py:15-153 —
MultiIterLoader ratio-weighted choice, IterLoader infinite epochs,
PrefetchLoader CUDA-stream H2D overlap). TPU redesign: instead of a CUDA
side-stream, a worker thread assembles and uploads the next batch with
jax.device_put while the current step runs, overlapping host work with
device compute (XLA dispatch is already async).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np


class IterLoader:
    """Infinite shuffled iterator over a dataset with a collate fn."""

    def __init__(self, dataset, batch_size: int, seed: int = 0, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = random.Random(seed)
        self.shuffle = shuffle
        self._order: List[int] = []
        self._pos = 0
        self.epoch = 0

    def _reshuffle(self):
        self._order = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(self._order)
        self._pos = 0
        self.epoch += 1

    def __next__(self):
        instances = []
        for _ in range(self.batch_size):
            if self._pos >= len(self._order):
                self._reshuffle()
            instances.append(self.dataset[self._order[self._pos]])
            self._pos += 1
        return self.dataset.collate(instances)

    def __iter__(self):
        return self


class MultiIterLoader:
    """Per-step ratio-weighted random choice across dataset loaders
    (reference dataloader_utils.py:15-64)."""

    def __init__(self, loaders: Sequence, ratios: Optional[Sequence[float]] = None, seed: int = 0):
        self.loaders = list(loaders)
        if ratios is None:
            ratios = [1.0] * len(self.loaders)
        total = float(sum(ratios))
        self.probs = [r / total for r in ratios]
        self.rng = random.Random(seed)

    def __next__(self):
        idx = self.rng.choices(range(len(self.loaders)), weights=self.probs)[0]
        return next(self.loaders[idx])

    def __iter__(self):
        return self


class ConcatDataset:
    """Concatenate datasets sharing a collator (reference
    data_utils.concat_datasets / datasets.ConcatDataset role)."""

    def __init__(self, datasets: Sequence):
        assert datasets
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for ds in self.datasets:
            self._offsets.append(total)
            total += len(ds)
        self._total = total

    def __len__(self) -> int:
        return self._total

    def __getitem__(self, index: int):
        for ds, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if index >= off:
                return ds[index - off]
        raise IndexError(index)

    def collate(self, instances):
        return self.datasets[0].collate(instances)


def reorg_datasets_by_split(datasets_by_name: dict) -> dict:
    """{name: {split: dataset}} → {split: [datasets]} (reference
    data_utils.reorg_datasets_by_split)."""
    by_split: dict = {}
    for _, splits in datasets_by_name.items():
        if not isinstance(splits, dict):
            splits = {"train": splits}
        for split, dataset in splits.items():
            by_split.setdefault(split, []).append(dataset)
    return by_split


def prepare_sample(batch, device=None):
    """Move a host batch's array leaves to device (reference
    data_utils.prepare_sample / move_to_cuda recursion)."""
    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, device) if device is not None else jax.device_put(x)
        return x

    return jax.tree.map(put, batch)


class DevicePrefetcher:
    """Background thread that collates + uploads the next batches while the
    device computes (the PrefetchLoader role, dataloader_utils.py:78-153)."""

    _STOP = object()

    def __init__(self, loader, put_fn: Optional[Callable] = None, depth: int = 2):
        self.loader = loader
        self.put_fn = put_fn or self._default_put
        self.queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    @staticmethod
    def _default_put(batch):
        return jax.tree.map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, batch
        )

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = next(self.loader)
                self.queue.put(self.put_fn(batch))
        except Exception as error:  # surface loader errors to the consumer
            self.queue.put(error)

    def __next__(self):
        item = self.queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def __iter__(self):
        return self

    def close(self):
        self._stop.set()
