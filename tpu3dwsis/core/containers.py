"""Fixed-shape batch containers.

The reference collates variable-length scenes into flat concatenated tensors
(``modules/datasets/scannetv2_dataset.py:343-474``).  The TPU design keeps
the same flat layout but pads every axis to a static capacity so the whole
step jits once per shape bucket:

* **points** padded to ``N``; invalid points carry ``valid=False`` and map to
  the superpoint null slot ``S``;
* **superpoints** padded to ``S`` (flat across scenes, like the reference's
  re-based global superpoint ids, ``scannetv2_dataset.py:383-387``);
* **edges** padded to ``E`` with endpoints = ``S``.

Null-slot convention: index == capacity is the dropped slot for segment ops
and gathers (see :mod:`tpu3dwsis.ops.segment`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax

__all__ = ["SceneBatch", "BatchStatics"]


class BatchStatics(NamedTuple):
    """Static (python-int) shape/bucket metadata accompanying a SceneBatch.

    These participate in jit cache keys, not in tracing.
    """

    spatial_shape: tuple  # (X, Y, Z) voxel grid extent at full resolution
    max_batch: int  # scenes per batch capacity
    max_voxels: int  # level-0 voxel capacity M
    num_levels: int  # U-Net depth
    level_sizes: tuple  # per-level voxel capacities
    max_points: int = 0  # N: point capacity
    max_superpoints: int = 0  # S: superpoint capacity
    max_edges: int = 0  # E: edge capacity
    max_instances: int = 128  # I_max: per-scene instance capacity

    @property
    def coarse_shapes(self):
        shapes = [self.spatial_shape]
        for _ in range(self.num_levels - 1):
            shapes.append(tuple((s + 1) // 2 for s in shapes[-1]))
        return tuple(shapes)


class SceneBatch(NamedTuple):
    """One padded training/eval batch (all jax arrays; leading dims static).

    Mirrors the reference collate output (``scannetv2_dataset.py:455-474``):
    ``point_coords`` = ``locs`` (scene id + discretized xyz), ``point_xyz`` =
    ``locs_float``, ``point_rgb`` = ``feats``, ``point_sp`` = re-based
    ``superpoint``, superpoint label arrays = the ``superpoint_*`` entries
    (occupancy already log-transformed as in ``scannetv2_dataset.py:441``),
    edge arrays = ``edge_u_list``/``edge_v_list`` + the 13-d precomputed edge
    features the ECC fnet consumes.
    """

    # points [N]
    point_coords: jax.Array  # [N, 4] int32 (scene, x, y, z)
    point_xyz: jax.Array  # [N, 3] float32 metric coords
    point_rgb: jax.Array  # [N, 3] float32 colors (aug noise already applied)
    point_valid: jax.Array  # [N] bool
    point_sp: jax.Array  # [N] int32 global superpoint id, S = null
    point_sem: jax.Array  # [N] int32, -100 ignore
    point_ins: jax.Array  # [N] int32, -100 ignore

    # superpoints [S]
    sp_valid: jax.Array  # [S] bool
    sp_scene: jax.Array  # [S] int32 scene index, num_scenes = null
    sp_sem: jax.Array  # [S] int32, -100 ignore
    sp_ins: jax.Array  # [S] int32 global instance id, -100 ignore
    sp_ins_local: jax.Array  # [S] int32 scene-local instance id in [0, I_max), -1 ignore
    sp_offset: jax.Array  # [S, 3] float32 center-offset target
    sp_occupancy: jax.Array  # [S] float32 log instance voxel count
    sp_size: jax.Array  # [S] float32 instance radius

    # edges [E]
    edge_u: jax.Array  # [E] int32, S = null
    edge_v: jax.Array  # [E] int32, S = null
    edge_feats: jax.Array  # [E, 13] float32
    edge_valid: jax.Array  # [E] bool

    @property
    def num_points(self) -> int:
        return self.point_coords.shape[0]

    @property
    def num_superpoints(self) -> int:
        return self.sp_valid.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_u.shape[0]
