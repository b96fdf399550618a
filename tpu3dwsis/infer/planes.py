"""RANSAC plane segmentation (open3d-free).

Replaces the reference's open3d ``segment_plane`` wall splitter
(``utils/planeSegment.py:29-63``): iteratively extract up to ``max_num``
planes from the wall-class points (inlier distance 0.1 m, 200 iterations),
stopping when fewer than ``min_points`` remain.
"""
from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["segment_plane", "get_room_walls"]


def segment_plane(
    xyz: np.ndarray,
    distance: float = 0.1,
    num_iterations: int = 200,
    rng: np.random.Generator | None = None,
):
    """Best-plane RANSAC: returns ``(plane[4], inlier_indices)``."""
    rng = rng or np.random.default_rng(0)
    n = len(xyz)
    best_count = -1
    best = None
    for _ in range(num_iterations):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = xyz[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-12:
            continue
        normal = normal / norm
        d = -normal @ p0
        dist = np.abs(xyz @ normal + d)
        count = int((dist < distance).sum())
        if count > best_count:
            best_count = count
            best = (np.append(normal, d), np.where(dist < distance)[0])
    if best is None:
        return np.zeros(4), np.arange(0)
    return best


def get_room_walls(
    xyz: np.ndarray,
    wall_mask: np.ndarray,
    distance: float = 0.1,
    num_iterations: int = 200,
    max_num: int = 10,
    min_points: int = 10000,
    seed: int = 0,
) -> List[np.ndarray]:
    """Split the wall-class mask into per-wall instance masks
    (``planeSegment.get_room_walls``, thresholds identical)."""
    rng = np.random.default_rng(seed)
    wall_mask = wall_mask.astype(bool)
    remain_idx = np.where(wall_mask)[0]
    remain_xyz = xyz[wall_mask]
    walls: List[np.ndarray] = []
    for _ in range(max_num):
        if len(remain_xyz) < min_points:
            break
        _, inliers = segment_plane(remain_xyz, distance, num_iterations, rng)
        if len(inliers) == 0:
            break
        mask = np.zeros(len(xyz), bool)
        mask[remain_idx[inliers]] = True
        walls.append(mask)
        keep = np.ones(len(remain_xyz), bool)
        keep[inliers] = False
        remain_xyz = remain_xyz[keep]
        remain_idx = remain_idx[keep]
    return walls
