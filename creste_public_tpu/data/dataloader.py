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


def _sample_rng(seed: int, epoch: int, j: int) -> np.random.Generator:
    """Deterministic per-sample augmentation rng — the ONE derivation both
    worker modes use (bit-identical batches across modes depend on it)."""
    return np.random.default_rng((seed + epoch) * 1_000_003 + int(j))


# --- process-pool worker state (spawn: module re-imported per worker) ----
_WORKER: dict = {}


def _proc_init(dataset, transform, seed):
    _WORKER["dataset"] = dataset
    _WORKER["transform"] = transform
    _WORKER["seed"] = seed


def _proc_fetch(job):
    """Fetch + transform of one sample inside a worker process."""
    epoch, j = job
    s = _WORKER["dataset"][int(j)]
    tf = _WORKER["transform"]
    if tf is not None:
        s = tf(s, _sample_rng(_WORKER["seed"], epoch, j))
    return s


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
                 transform: Callable | None = None,
                 num_workers: int = 4, worker_mode: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate = collate_fn
        self.transform = transform  # (sample, rng) -> sample (augmentation)
        # Intra-batch sample fetch runs on a thread pool by default: the
        # native libjpeg/libpng decode (data/native_io.py) and PIL both
        # release the GIL, so N threads decode N samples concurrently — the
        # in-process equivalent of the reference's num_workers DataLoader
        # processes (dataloader.py:183-194) without fork/pickle overhead.
        # worker_mode='process' instead fetches through a persistent spawn
        # Pool (dataset + transform must pickle), the true equivalent of
        # torch's worker processes — use it when the GIL-bound NumPy
        # assembly share of __getitem__ dominates the decode share.
        self.num_workers = max(1, int(num_workers))
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode: {worker_mode!r}")
        self.worker_mode = worker_mode
        self._pool = None

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("spawn")  # matches reference spawn policy
            self._pool = ctx.Pool(
                self.num_workers, initializer=_proc_init,
                initargs=(self.dataset, self.transform, self.seed),
            )
        return self._pool

    def close(self) -> None:
        """Terminate the persistent process pool (no-op in thread mode)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass

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

        def fetch_one(j: int) -> dict:
            s = self.dataset[int(j)]
            if self.transform is not None:
                s = self.transform(s, _sample_rng(self.seed, epoch, j))
            return s

        def put(item) -> bool:
            """Bounded put that aborts when the consumer abandoned the
            epoch (otherwise the producer thread blocks forever on a full
            queue and leaks)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        # A producer-thread failure (corrupt file, bad transform, collate
        # error) must surface to the consumer, not truncate the epoch
        # silently as a normal end-of-data.
        error: list[BaseException] = []

        def fetch_batch(pool, idxs):
            if self.worker_mode == "process":
                return self._process_pool().map(
                    _proc_fetch, [(epoch, j) for j in idxs])
            if self.num_workers > 1:
                return list(pool.map(fetch_one, idxs))
            return [fetch_one(j) for j in idxs]

        def produce():
            from contextlib import nullcontext

            use_threads = (self.worker_mode == "thread"
                           and self.num_workers > 1)
            if use_threads:
                from concurrent.futures import ThreadPoolExecutor

                cm = ThreadPoolExecutor(self.num_workers)
            else:
                cm = nullcontext()
            try:
                with cm as pool:
                    for i in range(0, end, self.batch_size):
                        if stop.is_set():
                            return
                        idxs = [int(j) for j in order[i : i + self.batch_size]]
                        samples = fetch_batch(pool, idxs)
                        if not put(self.collate(samples)):
                            return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                error.append(e)
            finally:
                put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)


class SequenceChunkLoader:
    """Temporal mini-sequence batches for ConvGRU training.

    The reference trains use_temporal models with a miniseq sampler:
    sequences are cut into fixed chunks, only chunk 0 carries the
    begin-of-sequence flag, and the RNN hidden state is carried (detached)
    across consecutive chunks (rnn.py:59-135 asserts exactly this layout).

    Yields {**stacked_chunk_tensors, 'bos': [B] bool}: frame-indexed keys
    (image, p2p, depth_label) get a [B, T, ...] time axis; per-scene label
    keys come from each chunk's LAST frame.
    """

    FRAME_KEYS = ("image", "p2p", "depth_label", "fimg_label")

    def __init__(self, dataset, batch_size: int, seq_len: int,
                 chunk_len: int, shuffle: bool = True, seed: int = 0):
        assert seq_len % chunk_len == 0, (
            "seq_len must be divisible by chunk_len (rnn.py:103 assert)"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.chunk_len = chunk_len
        self.shuffle = shuffle
        self.seed = seed
        n = len(dataset)
        self.windows = [
            i for i in range(0, n - seq_len + 1, seq_len)
        ]

    def __len__(self) -> int:
        per_seq = self.seq_len // self.chunk_len
        return (len(self.windows) // self.batch_size) * per_seq

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        order = np.asarray(self.windows)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        n_seq = len(order) - (len(order) % self.batch_size)
        per_seq = self.seq_len // self.chunk_len
        for i in range(0, n_seq, self.batch_size):
            starts = order[i : i + self.batch_size]
            for c in range(per_seq):
                frames = [
                    [self.dataset[int(s + c * self.chunk_len + t)]
                     for t in range(self.chunk_len)]
                    for s in starts
                ]
                batch: dict = {}
                sample0 = frames[0][-1]
                for k in sample0:
                    if k in self.FRAME_KEYS:
                        # [B, T, ...]; per-frame keys may carry a leading
                        # singleton view axis — squeeze it into time
                        batch[k] = np.stack([
                            np.concatenate([np.asarray(f[k]) for f in seq])
                            for seq in frames
                        ])
                    elif isinstance(sample0[k], dict):
                        batch[k] = collate([seq[-1][k] for seq in frames])
                    else:
                        batch[k] = np.stack(
                            [np.asarray(seq[-1][k]) for seq in frames]
                        )
                batch["bos"] = np.full((len(starts),), c == 0)
                yield batch


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
