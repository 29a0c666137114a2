"""Host-side parallel mapping for preprocessing/IO.

The preprocessing CLIs fan per-frame work over a thread pool (the native
decode and jitted device dispatch both release the GIL) — the in-process
equivalent of the reference's multiprocessing Pool(24)
(build_dense_depth.py:574) without fork/pickle overhead.
"""
from __future__ import annotations

from typing import Callable, Iterable, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def parallel_map(fn: Callable[[T], R], items: Iterable[T],
                 workers: int = 1) -> list[R]:
    """map(fn, items) on ``workers`` threads; order-preserving.

    workers <= 1 runs sequentially (deterministic debugging path).
    """
    items = list(items)
    if workers <= 1:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(fn, items))
