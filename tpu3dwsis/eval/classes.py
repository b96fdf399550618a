"""Dataset class tables (``evaluation/scannet_evaluator.py:20-107``,
``evaluation/s3dis_evaluator.py``, ``test_scannetv2.py:288-289``)."""
from __future__ import annotations

import numpy as np

SCANNET_CLASS_NAMES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]
# ScanNet benchmark semantic ids per class index (prepare_data_inst_gttxt.py:32)
SCANNET_SEMANTIC_IDS = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
)
# instance eval uses classes 2..19 (no wall/floor) — test_scannetv2.py:289
SCANNET_INSTANCE_CLASS_IDS = SCANNET_SEMANTIC_IDS[2:]
SCANNET_INSTANCE_CLASS_NAMES = SCANNET_CLASS_NAMES[2:]
SCANNET_VALID_CLASS_MASK = np.array([False, False] + [True] * 18)

S3DIS_CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "chair",
    "table", "bookcase", "sofa", "board", "clutter",
]
# S3DIS instance eval includes all 13 classes; ids are 1-based like the
# reference's gt encoding (s3dis semantic id = index + 1)
S3DIS_SEMANTIC_IDS = np.arange(1, 14)
# ceiling/floor/wall handled by plane post-processing, remaining by BFS
S3DIS_VALID_CLASS_MASK = np.array([False, False, False] + [True] * 10)
