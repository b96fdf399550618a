"""S3DIS dataset: area splits, training subsampling, block crop.

Differences from ScanNet captured from ``modules/datasets/s3dis_dataset.py``:

* area-based split by filename (``Area_<k>_*``): train = all areas except
  the test area, val/test = the test area (``:61-68``);
* optional random 1/4 point subsampling during training
  (``subsample_train``, ``:133-145``), toggled off for propagation/eval
  passes (``train_s3dis.py:405,483``);
* ``crop_v2``: binary-search an XY block around a random center point so at
  most ``max_npoint`` points survive (``:285-319``);
* whole-scene propagation match radius 1.2 m (``:986``).

Scene files use the same ``.npz`` Scene format as ScanNet (conversion from
the reference's prepared S3DIS data via :func:`convert_pth_scene` in
``tpu3dwsis.data.scannet`` works unchanged — the tuples have the same
layout).
"""
from __future__ import annotations

import glob
import math
import os
import re
from typing import List

import numpy as np

from .scene import Scene, load_scene

__all__ = ["load_area_split", "crop_block", "subsample_quarter", "S3DIS_NUM_CLASSES"]

S3DIS_NUM_CLASSES = 13


def load_area_split(npz_dir: str, split: str, test_area: int = 5) -> List[Scene]:
    files = sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
    pat = re.compile(rf"Area_{test_area}_")
    if split == "train":
        files = [f for f in files if not pat.search(os.path.basename(f))]
    else:
        files = [f for f in files if pat.search(os.path.basename(f))]
    return [load_scene(f) for f in files]


def subsample_quarter(n: int, rng: np.random.Generator) -> np.ndarray:
    """Random 1/4 point subset (``s3dis_dataset.py:133-145``)."""
    return rng.choice(n, size=n // 4, replace=False)


def crop_block(xyz: np.ndarray, rng: np.random.Generator, max_npoint: int) -> np.ndarray:
    """``crop_v2`` (``s3dis_dataset.py:285-319``): largest centered XY block
    (by binary search over scale) holding at most ``max_npoint`` points.
    Returns a keep mask."""
    if len(xyz) <= max_npoint:
        return np.ones(len(xyz), bool)
    room_max = xyz.max(0)
    center = xyz[rng.integers(len(xyz))][:3]
    ex = max(room_max[0] - center[0], center[0])
    ey = max(room_max[1] - center[1], center[1])
    scales = np.arange(0, 1, 0.05)

    def mask_at(s):
        dx, dy = ex * s, ey * s
        return (
            (xyz[:, 0] >= center[0] - dx)
            & (xyz[:, 0] <= center[0] + dx)
            & (xyz[:, 1] >= center[1] - dy)
            & (xyz[:, 1] <= center[1] + dy)
        )

    low, high = 0, len(scales) - 1
    while low < high:
        mid = int(math.ceil((low + high) / 2))
        if mask_at(scales[mid]).sum() <= max_npoint:
            low = mid
        else:
            high = mid - 1
    return mask_at(scales[high])
