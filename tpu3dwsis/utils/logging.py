"""Logging + metric buffers + timers.

Parity surface for the reference's vendored gorilla-lab utilities:
``collect_logger`` timestamped log dirs (``utils/logging.py:17-70``),
``HistoryBuffer`` latest/avg/median (``utils/log_buffer.py:180-273``),
``Timer`` (``utils/timer.py``), plus an optional tensorboardX writer
(``utils/log_buffer.py:12-90``) that degrades to a JSONL metrics file when
tensorboardX is unavailable.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import deque
from typing import Dict

__all__ = [
    "collect_logger",
    "HistoryBuffer",
    "Timer",
    "MetricsWriter",
    "convert_seconds",
    "format_table",
    "create_small_table",
]


def format_table(rows, headers) -> str:
    """Plain-text table (parity surface for the reference's tabulate wrappers,
    ``utils/logging.py:301-340``)."""
    rows = [[f"{c:.4f}" if isinstance(c, float) else str(c) for c in r] for r in rows]
    widths = [max(len(h), *(len(r[i]) for r in rows)) if rows else len(h) for i, h in enumerate(headers)]
    line = "  ".join(h.ljust(w) for h, w in zip(headers, widths))
    sep = "  ".join("-" * w for w in widths)
    body = "\n".join("  ".join(c.ljust(w) for c, w in zip(r, widths)) for r in rows)
    return "\n".join([line, sep, body] if rows else [line, sep])


def create_small_table(d) -> str:
    """Two-row key/value table (``create_small_table``)."""
    keys = list(d.keys())
    return format_table([[d[k] for k in keys]], keys)


def collect_logger(
    log_root: str = "log", prefix: str = "run", level=logging.INFO, log_dir: str | None = None
):
    """Create a timestamped ``.log`` file + console logger; returns
    ``(logger, log_dir)``.

    ``log_dir`` (when given) is used as-is and STABLE across runs — the log
    *file* is timestamped inside it, so checkpoints saved next to it remain
    findable by ``--resume`` (the reference keeps a stable ``cfg.log_dir``
    too, ``train_scannetv2.py:673-693``)."""
    stamp = time.strftime("%Y%m%d_%H%M%S")
    if log_dir is None:
        log_dir = os.path.join(log_root, prefix)
    os.makedirs(log_dir, exist_ok=True)
    # handlers live on the package-root logger so every tpu3dwsis.* module
    # logger (train, infer, ...) propagates into the same file/console
    logger = logging.getLogger("tpu3dwsis")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, f"{stamp}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger, log_dir


class HistoryBuffer:
    """Scalar series with latest / windowed average / global average."""

    def __init__(self, window: int = 20):
        self._window = deque(maxlen=window)
        self._total = 0.0
        self._count = 0
        self.latest = float("nan")

    def update(self, value: float):
        value = float(value)
        self.latest = value
        self._window.append(value)
        self._total += value
        self._count += 1

    @property
    def avg(self) -> float:
        return sum(self._window) / max(len(self._window), 1)

    @property
    def global_avg(self) -> float:
        return self._total / max(self._count, 1)

    def clear(self):
        self._window.clear()
        self._total = 0.0
        self._count = 0
        self.latest = float("nan")


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._last = self._start

    def since_start(self) -> float:
        return time.perf_counter() - self._start

    def since_last(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        return dt


def convert_seconds(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return f"{h:d}:{m:02d}:{s:02d}"


class MetricsWriter:
    """JSONL + TensorBoard event-file metrics (reference parity:
    ``utils/log_buffer.py:12-90`` wraps tensorboardX; here the TB format is
    written natively by :mod:`tpu3dwsis.utils.tbevents`)."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        self._tb = None
        if tensorboard:
            from .tbevents import TBEventWriter

            self._tb = TBEventWriter(log_dir)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def update(self, scalars: Dict[str, float], step: int):
        clean = {}
        for k, v in scalars.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
            self._tb.flush()
        self._jsonl.write(json.dumps({"step": step, **clean}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
