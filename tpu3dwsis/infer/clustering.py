"""Graph BFS instance clustering (host-side, numpy).

Re-implements ``clustering_in_graph`` from the reference test scripts
(``test_scannetv2.py:281-455``):

1. BFS over the superpoint graph, admitting a neighbor when it has the same
   predicted class and its offset-shifted center lies within
   ``bfs_ratio * pred_size[seed]`` of the current superpoint's center
   (``:336``; ScanNet ratio 0.25, S3DIS 0.8 — ``test_s3dis.py:349``);
2. groups with fewer occupied voxels than ``0.3 ×`` their predicted
   occupancy become *fragments* (``:383,394``), the rest *primaries*;
3. each fragment is absorbed into the nearest same-class primary within an
   adaptive radius ``r_set = max(r_size, r_voxel, r_ins_size)``
   (``:400-403,414-440``);
4. confidence = ``min(group_n / exp-occupancy-mean, 1)`` (``:443-450``).

The per-group voxel counting that the reference does by re-running
``pointgroup_ops.voxelization_idx`` per mask (``:386-390``) is a numpy
unique here (device batching of this count lives in
``tpu3dwsis.ops.voxelize.count_occupied_voxels``).
"""
from __future__ import annotations

import collections
from dataclasses import dataclass
from math import sqrt
from typing import List, Sequence

import numpy as np

__all__ = ["ClusterResult", "cluster_scene"]


@dataclass
class ClusterResult:
    confidences: np.ndarray  # [K]
    class_indices: np.ndarray  # [K] predicted class index per instance
    masks: np.ndarray  # [K, N] bool point masks


def _count_voxels(xyz: np.ndarray, scale: float) -> int:
    """Exact occupied-voxel count (``test_scannetv2.py:386-390`` re-runs
    ``voxelization_idx`` per mask).  Packs shifted coords into one int64 key
    with per-axis strides — collision-free, unlike a product-sum hash (this
    count feeds the ``fragment_ratio * occupancy`` primary/fragment split)."""
    if len(xyz) == 0:
        return 0
    v = np.floor(xyz * scale).astype(np.int64)
    v -= v.min(axis=0)
    span = v.max(axis=0) + 1
    return len(np.unique((v[:, 0] * span[1] + v[:, 1]) * span[2] + v[:, 2]))


def cluster_scene(
    xyz: np.ndarray,
    superpoint: np.ndarray,
    edges: np.ndarray,
    sp_sem_pred: np.ndarray,
    sp_offset_pred: np.ndarray,
    sp_occupancy_pred: np.ndarray,
    sp_size_pred: np.ndarray,
    valid_class_mask: Sequence[bool],
    bfs_ratio: float = 0.25,
    fragment_ratio: float = 0.3,
    scale: float = 50.0,
    voxel_size: float = 0.02,
) -> ClusterResult:
    """Cluster one whole scene into instances.

    ``valid_class_mask[c]`` marks classes eligible for instances (ScanNet
    excludes wall/floor, ``test_scannetv2.py:288-289``).
    """
    s = int(superpoint.max()) + 1
    assert len(sp_sem_pred) == s

    # superpoint centers + point counts
    count = np.bincount(superpoint, minlength=s).astype(np.float64)
    center = np.zeros((s, 3))
    for d in range(3):
        center[:, d] = np.bincount(superpoint, weights=xyz[:, d], minlength=s)
    center /= np.maximum(count, 1)[:, None]
    inst_center = center + sp_offset_pred

    nbrs: List[List[int]] = [[] for _ in range(s)]
    for u, v in edges:
        nbrs[int(u)].append(int(v))
        nbrs[int(v)].append(int(u))

    visited = np.zeros(s, bool)
    order = np.argsort(superpoint, kind="stable")
    starts = np.searchsorted(superpoint[order], np.arange(s))
    ends = np.searchsorted(superpoint[order], np.arange(s) + 1)

    def bfs(seed: int) -> List[int]:
        visited[seed] = True
        group = [seed]
        label = sp_sem_pred[seed]
        thresh = bfs_ratio * sp_size_pred[seed]
        queue = collections.deque([seed])
        while queue:
            cur = queue.popleft()
            for nb in nbrs[cur]:
                if visited[nb] or sp_sem_pred[nb] != label:
                    continue
                if np.linalg.norm(inst_center[cur] - inst_center[nb]) < thresh:
                    visited[nb] = True
                    group.append(nb)
                    queue.append(nb)
        return group

    def group_mask(group: List[int]) -> np.ndarray:
        m = np.zeros(len(xyz), bool)
        for sp_id in group:
            m[order[starts[sp_id] : ends[sp_id]]] = True
        return m

    def group_occupancy(group: List[int]) -> float:
        return float(np.exp(sp_occupancy_pred[np.asarray(group)]).mean())

    def group_center(group: List[int]) -> np.ndarray:
        g = np.asarray(group)
        w = count[g]
        return (inst_center[g] * w[:, None]).sum(0) / w.sum()

    def group_size(group: List[int]) -> float:
        return float(np.mean(sp_size_pred[np.asarray(group)]))

    primaries: List[dict] = []
    fragments: List[dict] = []

    for seed in range(s):
        if visited[seed] or not valid_class_mask[int(sp_sem_pred[seed])]:
            continue
        group = bfs(seed)
        mask = group_mask(group)
        occ = group_occupancy(group)
        n_voxels = _count_voxels(xyz[mask], scale)
        n_points = int(mask.sum())
        if n_voxels < fragment_ratio * occ:
            fragments.append(
                {
                    "mask": mask,
                    "label": int(sp_sem_pred[seed]),
                    "center": group_center(group),
                    "sps": group,
                    "n": n_points,
                }
            )
        else:
            r_voxel = voxel_size * sqrt(occ)
            r_size = 0.01 * sqrt(n_points)
            r_set = max(r_size, r_voxel, group_size(group))
            primaries.append(
                {
                    "mask": mask,
                    "label": int(sp_sem_pred[seed]),
                    "center": group_center(group),
                    "r_set": r_set,
                    "sps": group,
                    "n": n_points,
                }
            )

    for frag in fragments:
        best, best_d = None, np.inf
        for p in primaries:
            if p["label"] != frag["label"]:
                continue
            d = float(np.linalg.norm(frag["center"] - p["center"]))
            if d < best_d:
                best, best_d = p, d
        if best is not None and best_d < best["r_set"]:
            merged_sps = best["sps"] + frag["sps"]
            best["mask"] = best["mask"] | frag["mask"]
            best["center"] = group_center(merged_sps)
            best["r_set"] = max(
                voxel_size * sqrt(group_occupancy(merged_sps)),
                0.01 * sqrt(best["mask"].sum()),
                best["r_set"],
                group_size(merged_sps),
            )
            best["n"] = int(best["mask"].sum())
            best["sps"] = merged_sps

    if not primaries:
        return ClusterResult(
            np.zeros(0), np.zeros(0, np.int64), np.zeros((0, len(xyz)), bool)
        )
    conf = np.array(
        [min(p["n"] / group_occupancy(p["sps"]), 1.0) for p in primaries]
    )
    labels = np.array([p["label"] for p in primaries], np.int64)
    masks = np.stack([p["mask"] for p in primaries])
    return ClusterResult(conf, labels, masks)
