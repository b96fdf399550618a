"""Progress tracking (reference ``utils/processbar.py:60-203``)."""
from __future__ import annotations

import sys
import time
from typing import Callable, Iterable, List, Sequence

__all__ = ["track", "track_progress", "track_parallel_progress"]


def track(iterable: Iterable, description: str = "", stream=sys.stderr):
    """Iterate with a lightweight progress line (``track``)."""
    items = list(iterable)
    n = len(items)
    t0 = time.time()
    for i, item in enumerate(items):
        yield item
        if stream is not None and (i % max(n // 50, 1) == 0 or i == n - 1):
            dt = time.time() - t0
            eta = dt / (i + 1) * (n - i - 1)
            stream.write(f"\r{description} {i + 1}/{n} ({dt:.1f}s, eta {eta:.1f}s)")
            stream.flush()
    if stream is not None and n:
        stream.write("\n")


def track_progress(fn: Callable, items: Sequence, description: str = "") -> List:
    """Apply ``fn`` over items with progress (``track_progress``)."""
    return [fn(x) for x in track(items, description)]


def track_parallel_progress(
    fn: Callable, items: Sequence, nproc: int = 2, description: str = ""
) -> List:
    """Thread-parallel map with progress (``track_parallel_progress``;
    threads instead of processes — the heavy work here is numpy/native code
    that releases the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=nproc) as ex:
        return list(track(ex.map(fn, items), description))
