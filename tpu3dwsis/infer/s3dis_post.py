"""S3DIS inference post-processing.

The S3DIS test protocol (``test_s3dis.py:281-560``) differs from ScanNet:

* BFS center-distance threshold ``0.8 * pred_size`` (``:349``);
* ceiling (class 0) and floor (class 1) are each emitted as ONE instance if
  they have > 100 points, confidence 1 (``:520-530``);
* wall points (class 2) are split into per-wall instances by iterative
  RANSAC planes, confidence 1 (``:533-538``, ``utils/planeSegment.py``);
* remaining classes go through the same BFS/fragment clustering.
"""
from __future__ import annotations

import numpy as np

from ..eval.classes import S3DIS_VALID_CLASS_MASK
from .clustering import ClusterResult, cluster_scene
from .planes import get_room_walls

__all__ = ["cluster_scene_s3dis"]


def cluster_scene_s3dis(
    xyz: np.ndarray,
    superpoint: np.ndarray,
    edges: np.ndarray,
    sp_sem_pred: np.ndarray,
    sp_offset_pred: np.ndarray,
    sp_occupancy_pred: np.ndarray,
    sp_size_pred: np.ndarray,
    bfs_ratio: float = 0.8,
    min_struct_points: int = 100,
) -> ClusterResult:
    res = cluster_scene(
        xyz,
        superpoint,
        edges,
        sp_sem_pred,
        sp_offset_pred,
        sp_occupancy_pred,
        sp_size_pred,
        S3DIS_VALID_CLASS_MASK,
        bfs_ratio=bfs_ratio,
    )
    confs = list(res.confidences)
    labels = list(res.class_indices)
    masks = list(res.masks)

    point_pred = sp_sem_pred[superpoint]
    for cls in (0, 1):  # ceiling, floor: single instance each
        mask = point_pred == cls
        if mask.sum() > min_struct_points:
            confs.append(1.0)
            labels.append(cls)
            masks.append(mask)

    wall_mask = point_pred == 2
    for wall in get_room_walls(xyz, wall_mask):
        confs.append(1.0)
        labels.append(2)
        masks.append(wall)

    if not masks:
        return res
    return ClusterResult(
        np.asarray(confs), np.asarray(labels, np.int64), np.stack(masks)
    )
