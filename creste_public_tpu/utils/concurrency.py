"""Host-side parallel mapping for preprocessing/IO.

The preprocessing CLIs fan per-frame work over a pool — the in-process
equivalent of the reference's multiprocessing Pool(24)
(build_dense_depth.py:574). Two modes:

  * ``thread``: right when the body releases the GIL — native C decode,
    jitted device dispatch, torch/BLAS kernels. No fork/pickle overhead.
  * ``process``: spawn-based pool for GIL-bound NumPy/PIL-heavy bodies
    (the reference's Pool equivalent); ``fn`` and items must pickle, so
    callers pass a module-level function + plain-data items.
"""
from __future__ import annotations

from typing import Callable, Iterable, Literal, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def parallel_map(
    fn: Callable[[T], R],
    items: Iterable[T],
    workers: int = 1,
    mode: Literal["thread", "process"] = "thread",
) -> list[R]:
    """map(fn, items) on ``workers`` threads or processes; order-preserving.

    workers <= 1 runs sequentially (deterministic debugging path).
    """
    items = list(items)
    if workers <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    if mode == "process":
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # spawn matches the reference's start method everywhere
        # (train_pefree.py:312) and avoids forking a JAX-initialised parent
        ctx = mp.get_context("spawn")
        chunk = max(1, len(items) // (workers * 4))
        with ProcessPoolExecutor(workers, mp_context=ctx) as ex:
            return list(ex.map(fn, items, chunksize=chunk))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(fn, items))
