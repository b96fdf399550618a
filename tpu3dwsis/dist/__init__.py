"""Distributed: device mesh, shardings, collective helpers."""

from .launch import host_scene_shard, initialize  # noqa: F401
from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
