"""Batched multi-scene padded inference.

The reference evaluates one whole scene per forward (``test_scannetv2.py:109``,
batch_size=1). On TPU a single padded batch holds several whole scenes
(BASELINE "Batched multi-scene inference" config): one jitted forward per
group, then per-scene slices feed the host clustering. The per-scene
boundaries come from the collate offset metadata.
"""
from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

from ..data.collate import to_scene_batch
from ..data.loader import SceneDataset
from ..data.scene import Scene

__all__ = ["batched_scene_outputs"]


def batched_scene_outputs(
    forward,
    params,
    batch_stats,
    dataset: SceneDataset,
    group_size: int,
    rng: np.random.Generator,
) -> Iterator[Tuple[Scene, Dict[str, np.ndarray]]]:
    """Yield ``(scene, outputs)`` per scene, running ``group_size`` whole
    scenes per device forward. Output arrays are sliced back to each scene's
    true point/superpoint/edge counts."""
    n = len(dataset.scenes)
    for start in range(0, n, group_size):
        idxs = list(range(start, min(start + group_size, n)))
        arrays = dataset.collate_batch(idxs, rng, training=False)
        batch = to_scene_batch(arrays)
        outs = forward(params, batch_stats, batch)
        po = arrays["_point_offsets"]
        so = arrays["_sp_offsets"]
        eo = arrays["_edge_offsets"]
        host = {k: np.asarray(v) for k, v in outs.items()}
        for j, idx in enumerate(idxs):
            scene = dataset.scenes[idx]
            sl_p = slice(po[j], po[j + 1])
            sl_s = slice(so[j], so[j + 1])
            sl_e = slice(eo[j], eo[j + 1])
            yield scene, {
                "semantic_scores": host["semantic_scores"][sl_p],
                "sp_semantic_scores": host["sp_semantic_scores"][sl_s],
                "sp_semantic_softmax": host.get("sp_semantic_softmax", host["sp_semantic_scores"])[sl_s],
                "pred_sp_offset_vectors": host["pred_sp_offset_vectors"][sl_s],
                "pred_sp_occupancy": host["pred_sp_occupancy"][sl_s],
                "pred_sp_ins_size": host["pred_sp_ins_size"][sl_s],
                "edge_affinity": host["edge_affinity"][sl_e],
                "edge_u": np.asarray(batch.edge_u)[sl_e] - so[j],
                "edge_v": np.asarray(batch.edge_v)[sl_e] - so[j],
            }
