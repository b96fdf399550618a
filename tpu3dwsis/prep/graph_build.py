"""Offline superpoint-graph construction.

Mirrors ``build_weak_label_graph`` + ``compute_edges_feature``
(``data/ScanNetV2/prepare_data_inst_ScanNetV2.py:172-285,340-433``):

* **adjacency edges** — the reference uses mesh faces straddling two
  superpoints (``:193-202``); when a mesh is available we accept its face
  array, otherwise we recover contact adjacency from point k-NN pairs that
  cross superpoints (equivalent contact relation for dense scans);
* **KDTree extra edges** — superpoint centers within 0.3 m, up to 5 new
  neighbors each (``:213-226``);
* **13-d edge features** — Δmean / Δstd / Δcentroid of matched point
  samples, plus length/surface/volume/point-count ratios from the
  eigenvalues of each superpoint's covariance (``:340-433``), standardized
  per scene (``:265-266``);
* **superpoint ground truth** — mode semantic / mode instance label and the
  offset from superpoint center to instance center (``:238-255``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["build_superpoint_graph", "compute_edge_features", "superpoint_stats"]

IGNORE = -100


def _segment_mode(seg: np.ndarray, vals: np.ndarray, s: int) -> np.ndarray:
    """Per-segment mode of integer labels; ties go to the smallest value
    (scipy.stats.mode convention)."""
    vmin = int(vals.min())
    v = (vals - vmin).astype(np.int64)
    nv = int(v.max()) + 1
    cnt = np.bincount(seg.astype(np.int64) * nv + v, minlength=s * nv).reshape(s, nv)
    return (cnt.argmax(axis=1) + vmin).astype(np.int32)


def superpoint_stats(xyz: np.ndarray, superpoint: np.ndarray):
    """Per-superpoint centroid, eigen shape features and point count.

    Vectorized version of the per-superpoint loop at
    ``prepare_data_inst_ScanNetV2.py:361-395``.
    """
    s = int(superpoint.max()) + 1
    count = np.bincount(superpoint, minlength=s).astype(np.float64)
    cent = np.zeros((s, 3))
    for d in range(3):
        cent[:, d] = np.bincount(superpoint, weights=xyz[:, d], minlength=s)
    cent /= np.maximum(count, 1)[:, None]

    # second moments for covariance eigenvalues
    diff = xyz - cent[superpoint]
    cov = np.zeros((s, 3, 3))
    for i in range(3):
        for j in range(i, 3):
            m = np.bincount(superpoint, weights=diff[:, i] * diff[:, j], minlength=s)
            cov[:, i, j] = m
            cov[:, j, i] = m
    denom = np.maximum(count - 1, 1)[:, None, None]  # np.cov default ddof=1
    cov /= denom

    ev = np.linalg.eigvalsh(cov)[:, ::-1]  # descending, real symmetric
    length = ev[:, 0].copy()
    surface = np.sqrt(np.maximum(ev[:, 0] * ev[:, 1], 0) + 1e-10)
    volume = np.sqrt(np.maximum(ev[:, 0] * ev[:, 1] * ev[:, 2], 0) + 1e-10)
    # degenerate cases, matching the reference's special handling (:367-377)
    length[count == 1] = 0
    surface[count <= 2] = 0
    volume[count <= 2] = 0
    length[count == 2] = np.sqrt(
        np.maximum(ev[count == 2].sum(axis=1), 0)
    )  # sqrt of total variance for 2-point superpoints (:373)
    return cent, length, surface, volume, count


def compute_edge_features(
    xyz: np.ndarray,
    superpoint: np.ndarray,
    edges: np.ndarray,
    rng: np.random.Generator,
    max_sample: int = 128,
) -> np.ndarray:
    """13-d per-edge features (``compute_edges_feature``, ``:340-433``).

    The reference pairs a random equal-size sample of the two superpoints'
    points to get Δmean/Δstd/Δnorm; we additionally cap the sample at
    ``max_sample`` points (statistically identical, bounded cost).
    """
    cent, length, surface, volume, count = superpoint_stats(xyz, superpoint)

    # native fast path (OpenMP; tpu3dwsis/native wsis_edge_features)
    from .. import native as _native

    shape_feats = np.stack([length, surface, volume], axis=1)
    native_out = _native.edge_features(
        xyz, superpoint, np.asarray(edges, np.int64).reshape(-1, 2), cent, shape_feats,
        max_sample=max_sample, seed=int(rng.integers(0, 2**31)),
    )
    if native_out is not None:
        feats = native_out
        if len(feats) == 0:
            return feats
        mu = feats.mean(0, keepdims=True)
        sd = feats.std(0, keepdims=True)
        return ((feats - mu) / np.maximum(sd, 1e-8)).astype(np.float32)

    order = np.argsort(superpoint, kind="stable")
    starts = np.searchsorted(superpoint[order], np.arange(len(cent)))
    ends = np.searchsorted(superpoint[order], np.arange(len(cent)) + 1)

    e = len(edges)
    feats = np.zeros((e, 13), np.float32)
    for ei, (s_id, t_id) in enumerate(edges):
        ns, nt = ends[s_id] - starts[s_id], ends[t_id] - starts[t_id]
        k = min(ns, nt, max_sample)
        src = order[starts[s_id] : ends[s_id]]
        tgt = order[starts[t_id] : ends[t_id]]
        if ns > k:
            src = rng.choice(src, k, replace=False)
        if nt > k:
            tgt = rng.choice(tgt, k, replace=False)
        delta = xyz[src[:k]] - xyz[tgt[:k]]
        if k > 1:
            dm, dstd = delta.mean(0), delta.std(0)
        else:
            dm, dstd = delta[0], np.zeros(3)
        feats[ei, 0:3] = dm
        feats[ei, 3:6] = dstd
        feats[ei, 6:9] = cent[s_id] - cent[t_id]
        feats[ei, 9] = length[s_id] / (length[t_id] + 1e-6)
        feats[ei, 10] = surface[s_id] / (surface[t_id] + 1e-6)
        feats[ei, 11] = volume[s_id] / (volume[t_id] + 1e-6)
        feats[ei, 12] = count[s_id] / (count[t_id] + 1e-6)
    if e == 0:
        return feats
    # per-scene standardization (StandardScaler, :265-266)
    mu = feats.mean(0, keepdims=True)
    sd = feats.std(0, keepdims=True)
    return ((feats - mu) / np.maximum(sd, 1e-8)).astype(np.float32)


def build_superpoint_graph(
    xyz: np.ndarray,
    superpoint: np.ndarray,
    semantic: Optional[np.ndarray] = None,
    instance: Optional[np.ndarray] = None,
    faces: Optional[np.ndarray] = None,
    seed: int = 0,
    contact_knn: int = 6,
    radius: float = 0.3,
    max_extra: int = 5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns ``(edges[e,2], edge_feats[e,13], sp_sem, sp_ins, sp_offset)``."""
    rng = np.random.default_rng(seed)
    s = int(superpoint.max()) + 1
    edge_set = set()

    if faces is not None:
        for face in faces:
            sp = np.unique(superpoint[face])
            if len(sp) == 1:
                continue
            for i in range(len(sp)):
                for j in range(i + 1, len(sp)):
                    edge_set.add((int(sp[i]), int(sp[j])))
                    edge_set.add((int(sp[j]), int(sp[i])))
    else:
        # contact adjacency from point k-NN crossing superpoints
        tree = cKDTree(xyz)
        _, nbr = tree.query(xyz, k=min(contact_knn + 1, len(xyz)))
        src_sp = np.repeat(superpoint, nbr.shape[1] - 1)
        dst_sp = superpoint[nbr[:, 1:].reshape(-1)]
        cross = src_sp != dst_sp
        a, b = src_sp[cross].astype(np.int64), dst_sp[cross].astype(np.int64)
        pairs = np.unique(
            np.concatenate([a * s + b, b * s + a])
        )
        edge_set.update(zip((pairs // s).tolist(), (pairs % s).tolist()))

    # KDTree radius edges on superpoint centers (:213-226)
    cent, *_ = superpoint_stats(xyz, superpoint)
    ctree = cKDTree(cent)
    for s_id, t_list in enumerate(ctree.query_ball_point(cent, r=radius)):
        cnt = 0
        for t_id in sorted(t_list):
            if t_id == s_id:
                continue
            if cnt >= max_extra:
                break
            if (s_id, t_id) not in edge_set:
                edge_set.add((s_id, t_id))
                edge_set.add((t_id, s_id))
                cnt += 1

    edges = np.asarray(sorted(edge_set), np.int32).reshape(-1, 2)

    sp_sem = np.full(s, IGNORE, np.int32)
    sp_ins = np.full(s, IGNORE, np.int32)
    sp_offset = np.zeros((s, 3), np.float32)
    if semantic is not None and instance is not None:
        # vectorized per-superpoint mode labels + instance-center offsets
        # (same tie behavior as scipy.stats.mode: smallest value wins a tie,
        # so IGNORE=-100 beats real labels on ties, matching the reference's
        # per-superpoint loop at prepare_data_inst_ScanNetV2.py:238-255)
        sp_sem = _segment_mode(superpoint, semantic, s)
        sp_ins = _segment_mode(superpoint, instance, s)
        uniq_ins, inv = np.unique(instance, return_inverse=True)
        icnt = np.maximum(np.bincount(inv, minlength=len(uniq_ins)), 1)
        icent = np.stack(
            [np.bincount(inv, weights=xyz[:, d], minlength=len(uniq_ins)) for d in range(3)],
            axis=1,
        ) / icnt[:, None]
        mode_pos = np.searchsorted(uniq_ins, sp_ins)
        sp_offset = (icent[mode_pos] - cent).astype(np.float32)

    edge_feats = compute_edge_features(xyz, superpoint, edges, rng)
    return edges, edge_feats, sp_sem, sp_ins, sp_offset
