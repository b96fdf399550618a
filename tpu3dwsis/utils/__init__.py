"""Utility platform: config, logging, timers, metric buffers."""

from .config import Config, ConfigDict  # noqa: F401
from .env import collect_env_info, set_random_seed  # noqa: F401
from .logging import HistoryBuffer, MetricsWriter, Timer, collect_logger, convert_seconds  # noqa: F401
from .memory import parameter_count, retry_if_oom  # noqa: F401
from .progress import track, track_parallel_progress, track_progress  # noqa: F401
