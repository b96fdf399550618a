"""Shape-bucket policy: derive padded capacities from dataset statistics.

SURVEY §7.3 hard part #2: every axis (points, voxels, superpoints, edges)
must be statically padded for jit, but the reference's scenes vary by 20×
(N ∈ [~50k, 1M]).  ``fit_statics`` measures the dataset and picks
capacities that cover the worst batch with a safety margin, rounded to
hardware-friendly multiples; collate raises on overflow, so the margin is
the contract.

Voxel counts are bounded by point counts (dedup only shrinks), and each
k2s2 level at most halves the active count in the worst case for surface
data; we measure level-0 voxels exactly and use a conservative /2 ladder.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..data.scene import Scene
from .containers import BatchStatics

__all__ = ["fit_statics"]


def _round_up(x: int, mult: int) -> int:
    return int(-(-x // mult) * mult)


def fit_statics(
    scenes: Sequence[Scene],
    batch_size: int,
    scale: float = 50.0,
    max_npoint: int = 250000,
    spatial_extent="auto",  # int, or "auto" = per-axis extents from the data
    aug_margin=(1.45, 1.45, 1.35),  # rotation is √2 in XY + jitter; (1,1,1) for eval
    num_levels: int = 5,
    margin: float = 1.3,
    max_instances: int = 128,
    sample: int | None = None,
) -> BatchStatics:
    """Measure the dataset (ALL scenes by default — a 64-scene sample once
    missed outlier superpoint/edge counts and crashed multi-hour runs; the
    measurement is cheap numpy) and size a training bucket for
    ``batch_size`` of the largest scenes."""
    scenes = list(scenes)[:sample] if sample else list(scenes)
    pts, sps, edges = [], [], []
    level_voxels = [[] for _ in range(num_levels)]
    ext = np.zeros(3, np.int64)
    for sc in scenes:
        n = min(sc.num_points, max_npoint)
        pts.append(n)
        sps.append(sc.num_superpoints)
        edges.append(sc.num_edges)
        c = np.floor(sc.xyz[:n] * scale).astype(np.int64)
        c -= c.min(0)
        ext = np.maximum(ext, c.max(0) + 1)
        # measure the ACTUAL k2s2 downsample ladder: dense scans barely
        # shrink at the first halving, so a /2 assumption silently
        # overflows (= drops voxels) at intermediate levels
        for lvl in range(num_levels):
            key = (c[:, 0] * 2097152 + c[:, 1] * 2048 + c[:, 2]).astype(np.int64)
            level_voxels[lvl].append(len(np.unique(key)))
            c = c // 2

    if spatial_extent == "auto":
        # per-axis extents keep the packed int32 key space small enough for
        # uncropped whole-scene evaluation; augmentation (random XY rotation,
        # jitter) can stretch a scene past its measured extent, hence margins
        spatial_shape = tuple(
            int(_round_up(int(np.ceil(e * m)), 64)) for e, m in zip(ext, aug_margin)
        )
    else:
        spatial_shape = (int(spatial_extent),) * 3
    key_space = batch_size * int(np.prod(np.asarray(spatial_shape, np.int64)))
    if key_space >= 2**31 - 1:
        raise ValueError(
            f"packed key space {batch_size}x{spatial_shape} overflows int32; "
            "reduce batch_size or crop (max_npoint)"
        )

    def cap(per_scene, mult):
        top = sorted(per_scene, reverse=True)[:batch_size]
        total = sum(top) if len(top) >= batch_size else sum(top) * batch_size // max(len(top), 1)
        return _round_up(int(total * margin), mult)

    level_sizes = tuple(max(cap(lv, 4096), 4096) for lv in level_voxels)
    m0 = level_sizes[0]
    return BatchStatics(
        spatial_shape=spatial_shape,
        max_batch=batch_size,
        max_voxels=m0,
        num_levels=num_levels,
        level_sizes=level_sizes,
        max_points=cap(pts, 4096),
        max_superpoints=cap(sps, 512),
        max_edges=cap(edges, 4096),
        max_instances=max_instances,
    )
