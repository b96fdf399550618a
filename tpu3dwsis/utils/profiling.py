"""Profiling hooks (SURVEY §5.1: the reference has manual timers only;
here we expose ``jax.profiler`` traces + a compile-cache helper)."""
from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["trace", "enable_compilation_cache"]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('log/profile'): step(...)`` → TensorBoard-viewable trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compilation_cache(cache_dir: str = ".jax_cache"):
    """Persist compiled executables across processes (big win: full-model TPU
    compiles take minutes in this environment)."""
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
