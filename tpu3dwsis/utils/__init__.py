"""Utility platform: config, logging, timers, metric buffers."""

from .config import Config, ConfigDict  # noqa: F401
from .logging import HistoryBuffer, MetricsWriter, Timer, collect_logger, convert_seconds  # noqa: F401
