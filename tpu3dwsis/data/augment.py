"""Optional augmentations beyond the jitter/flip/rot matrix in collate.

``elastic``: PointGroup-style elastic distortion (reference
``scannetv2_dataset.py:222-249``; config-off by default,
``config/ScanNet_v2_3D_WSIS.yaml:34`` ``with_elastic: False``): smooth a
random displacement field on a coarse grid (triple box-blur per axis) and
displace points by its trilinear interpolation.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator

__all__ = ["elastic"]


def elastic(xyz: np.ndarray, gran: float, mag: float, rng: np.random.Generator) -> np.ndarray:
    blur_axes = [
        np.ones((3, 1, 1)) / 3,
        np.ones((1, 3, 1)) / 3,
        np.ones((1, 1, 3)) / 3,
    ]
    bb = (np.abs(xyz).max(0) // gran).astype(np.int32) + 3
    noise = [rng.standard_normal(tuple(bb)).astype(np.float32) for _ in range(3)]
    for _ in range(2):  # two rounds of triple box blur
        for ax in blur_axes:
            noise = [ndimage.convolve(n, ax, mode="constant", cval=0) for n in noise]
    axes = [np.linspace(-(b - 1) * gran, (b - 1) * gran, b) for b in bb]
    interp = [
        RegularGridInterpolator(axes, n, bounds_error=False, fill_value=0) for n in noise
    ]
    disp = np.stack([f(xyz) for f in interp], axis=1)
    return xyz + disp * mag
