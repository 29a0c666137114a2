"""Host-side data pipeline: dataset construction, prefetching epoch loaders,
multi-task cycling.

Replaces the reference's LightningDataModules + torch DataLoader workers
(dataloader.py:17-466): datasets are plain NumPy samplers (synthetic or the
CODa reader), batches are collated host-side and prefetched on a background
thread while the device runs the previous step; the stage-2/3 CombinedLoader
over named task datasets (`mode='max_size_cycle'`, dataloader.py:352-368)
becomes MultiTaskIterator. DistributedSampler is unnecessary — batches are
sharded over the mesh by the train step (parallel.shard_batch).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import numpy as np

from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate


def build_dataset(ds_cfg: Any, split: str = "train"):
    """Dataset factory by config name: 'synthetic' | 'coda'."""
    name = ds_cfg.get("name", "synthetic")
    if name == "synthetic":
        return SyntheticCodaDataset(
            cfg=ds_cfg.get(split, ds_cfg),
            seed={"train": 0, "val": 1, "test": 2}.get(split, 0),
        )
    if name == "coda":
        from creste_public_tpu.data.coda_dataset import CodaDataset

        return CodaDataset(ds_cfg, split=split)
    raise ValueError(f"Unknown dataset: {name}")


class EpochLoader:
    """Shuffled, collated, background-prefetched epoch iterator.

    Equivalent of DataLoader(num_workers=N, persistent_workers=True): one
    producer thread keeps ``prefetch`` collated batches ready while the
    device steps, which hides host I/O for CODa-scale samples.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                 collate_fn: Callable = collate,
                 transform: Callable | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate = collate_fn
        self.transform = transform  # (sample, rng) -> sample (augmentation)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        end = n - (n % self.batch_size) if self.drop_last else n

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for i in range(0, end, self.batch_size):
                    if stop.is_set():
                        return
                    idxs = order[i : i + self.batch_size]
                    samples = [self.dataset[int(j)] for j in idxs]
                    if self.transform is not None:
                        samples = [
                            self.transform(
                                s,
                                np.random.default_rng(
                                    (self.seed + epoch) * 1_000_003 + int(j)
                                ),
                            )
                            for s, j in zip(samples, idxs)
                        ]
                    q.put(self.collate(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)


class MultiTaskIterator:
    """Cycle named task loaders to the longest one (CombinedLoader
    max_size_cycle, dataloader.py:352-368). Yields (task, batch)."""

    def __init__(self, loaders: dict[str, EpochLoader]):
        self.loaders = loaders

    def epoch(self, epoch: int = 0) -> Iterator[tuple[str, dict]]:
        iters = {k: v.epoch(epoch) for k, v in self.loaders.items()}
        lengths = {k: len(v) for k, v in self.loaders.items()}
        longest = max(lengths.values())
        counts = dict.fromkeys(iters, 0)
        for _ in range(longest):
            for task in list(iters):
                try:
                    batch = next(iters[task])
                except StopIteration:
                    iters[task] = self.loaders[task].epoch(epoch + 1000 + counts[task])
                    counts[task] += 1
                    batch = next(iters[task])
                yield task, batch
