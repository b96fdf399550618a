"""Offline data preparation: superpoint graph construction, mesh
segmentation, dataset converters."""

from .graph_build import build_superpoint_graph  # noqa: F401
