"""OOM resilience (reference ``utils/memory.py:31-84`` ``retry_if_cuda_oom``).

On TPU there is no ``empty_cache``; the retry ladder is: (1) clear jax's
live-buffer caches and retry on device, (2) retry the computation on CPU.
Also exposes ``parameter_count`` (``utils/memory.py:86+``).
"""
from __future__ import annotations

import functools
import logging
from typing import Callable

import jax
import numpy as np

__all__ = ["retry_if_oom", "parameter_count"]

log = logging.getLogger("tpu3dwsis.memory")


def _is_oom(err: Exception) -> bool:
    s = str(err)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "hbm" in s.lower()


def retry_if_oom(fn: Callable) -> Callable:
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            log.warning("OOM in %s; clearing caches and retrying", fn.__name__)
            jax.clear_caches()
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            log.warning("OOM again in %s; retrying on CPU", fn.__name__)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                args = jax.device_put(args, cpu)
                kwargs = jax.device_put(kwargs, cpu)
                return fn(*args, **kwargs)

    return wrapped


def parameter_count(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
