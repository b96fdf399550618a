"""Core containers and configuration."""

from .containers import BatchStatics, SceneBatch  # noqa: F401
