"""Inference: whole-scene forward + host graph clustering."""

from .clustering import ClusterResult, cluster_scene  # noqa: F401
