"""Ground-truth txt export (reference ``prepare_data_inst_gttxt.py``).

Writes per-scene ``<scene>_ins.txt`` (one encoded id per point:
``semantic_id*1000 + instance_index + 1``, 0 for unannotated) and
``<scene>_sem.txt`` — the format the reference's file-based evaluators
consume, useful for cross-checking our in-memory evaluation against the
reference implementation on identical predictions.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..data.scene import Scene
from ..eval.instance_ap import encode_gt_instances

__all__ = ["export_gt_txt"]


def export_gt_txt(scenes: Sequence[Scene], out_dir: str, semantic_ids: np.ndarray):
    """``semantic_ids[class_index]`` maps class indices to dataset ids
    (e.g. :data:`tpu3dwsis.eval.classes.SCANNET_SEMANTIC_IDS`)."""
    os.makedirs(out_dir, exist_ok=True)
    for scene in scenes:
        sem_ids = np.where(
            scene.sem >= 0, semantic_ids[np.clip(scene.sem, 0, len(semantic_ids) - 1)], 0
        )
        gt = encode_gt_instances(sem_ids, scene.ins)
        np.savetxt(os.path.join(out_dir, f"{scene.name}_ins.txt"), gt, fmt="%d")
        np.savetxt(os.path.join(out_dir, f"{scene.name}_sem.txt"), sem_ids, fmt="%d")
