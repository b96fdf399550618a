"""Host-side plan precompute: move the per-step device sorts into collate.

The jitted train step spends a large slice of its plan construction in two
kinds of device sort (measured, NEXT.md): the voxelize argsort over ~1M
points and one ``jnp.unique`` bitonic sort per U-Net level link (the halved
coarse keys are only piecewise-sorted — see ``rulebook.build_downsample`` —
so the device cannot avoid a real sort).  On the host these are cheap numpy
passes (~100 ms/batch) that the loader's prefetch thread fully overlaps with
the previous device step, so doing them here removes the device cost without
adding wall-clock anywhere.

Collate (with ``host_plan=True``, training only) then:

* sorts every per-point array by the packed level-0 voxel key, so the device
  voxelize runs sort-free (``voxelize_coords(presorted=True)``) and all its
  downstream segment ops see sorted ids;
* attaches per-level sorted coarse key tables and fine→coarse parent maps
  (``hp_level_keys`` / ``hp_parents``), so the device builds every level
  link scatter-only (``rulebook.build_unet_plan_hosted``).

The numpy key packing below reproduces ``ops.hashgrid.pack_coords``
bit-exactly (int64 intermediate, int32 truncation — values fit int32 by
statics construction, asserted here).

Host-plan is a training-path optimization: eval collate keeps original point
order because the batched-inference slicers map outputs back to scene order
(``infer/batched.py:39-58``).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from ..core.containers import BatchStatics
from ..ops.hashgrid import PAD_KEY

__all__ = ["pack_coords_np", "sort_key_np", "build_host_plan"]


def _strides(spatial_shape: Sequence[int], max_batch: int) -> Tuple[int, int, int, int]:
    sx, sy, sz = (int(s) for s in spatial_shape)
    return sx * sy * sz, sy * sz, sz, 1


def pack_coords_np(
    coords: np.ndarray,
    spatial_shape: Sequence[int],
    max_batch: int,
    valid: np.ndarray | None = None,
) -> np.ndarray:
    """Numpy twin of :func:`tpu3dwsis.ops.hashgrid.pack_coords`."""
    sb, sx, sy, sz = _strides(spatial_shape, max_batch)
    c = coords.astype(np.int64)
    hi = np.array([max_batch, *[int(s) for s in spatial_shape]], np.int64)
    in_range = np.all((c >= 0) & (c < hi[None, :]), axis=1)
    if valid is not None:
        in_range &= valid
    key = c[:, 0] * sb + c[:, 1] * sx + c[:, 2] * sy + c[:, 3] * sz
    assert int(max_batch) * sb <= np.iinfo(np.int32).max, "key space exceeds int32"
    return np.where(in_range, key, np.int64(PAD_KEY)).astype(np.int32)


def sort_key_np(
    point_coords: np.ndarray, point_valid: np.ndarray, statics: BatchStatics
) -> np.ndarray:
    """Stable permutation sorting points by packed level-0 voxel key (invalid
    rows → PAD tail).  The batch index has the largest stride, so per-scene
    grouping of the *valid* points survives the sort."""
    keys = pack_coords_np(
        point_coords, statics.spatial_shape, statics.max_batch, valid=point_valid
    )
    return np.argsort(keys, kind="stable")


def build_host_plan(
    point_coords: np.ndarray,
    point_valid: np.ndarray,
    statics: BatchStatics,
) -> Dict[str, tuple]:
    """Per-level sorted coarse key tables + fine→coarse parent maps.

    Returns ``{"hp_level_keys": (k_1, ..), "hp_parents": (p_0, ..)}`` where
    ``k_i`` is the padded sorted key table of level ``i`` (``i`` from 1) and
    ``p_i`` maps each level-``i`` voxel slot to its level-``i+1`` slot
    (capacity = null), replicating ``rulebook.build_downsample`` semantics
    including capacity-overflow truncation (sorted unique keeps the first
    ``cap`` keys; dropped voxels' children go to the null slot).
    """
    shapes = statics.coarse_shapes
    caps = [int(c) for c in statics.level_sizes]

    # level-0 voxel set from the (possibly unsorted) point coords
    keys0 = pack_coords_np(
        point_coords, statics.spatial_shape, statics.max_batch, valid=point_valid
    )
    uniq = np.unique(keys0)
    uniq = uniq[uniq != PAD_KEY][: caps[0]]
    level_keys, parents = [], []
    fine_keys = uniq
    for i in range(1, statics.num_levels):
        fine_shape, coarse_shape = shapes[i - 1], shapes[i]
        sb, sx, sy, sz = _strides(fine_shape, statics.max_batch)
        k = fine_keys.astype(np.int64)
        b = k // sb
        r = k - b * sb
        x = r // sx
        r -= x * sx
        y = r // sy
        z = r - y * sy
        csb, csx, csy, csz = _strides(coarse_shape, statics.max_batch)
        ck = b * csb + (x // 2) * csx + (y // 2) * csy + (z // 2) * csz
        cu = np.unique(ck)[: caps[i]]
        pos = np.searchsorted(cu, ck)
        pos_c = np.minimum(pos, len(cu) - 1) if len(cu) else np.zeros_like(pos)
        found = (len(cu) > 0) & (cu[pos_c] == ck) if len(cu) else np.zeros(len(ck), bool)
        parent = np.full(caps[i - 1], caps[i], np.int32)
        parent[: len(ck)] = np.where(found, pos_c, caps[i]).astype(np.int32)
        pad_k = np.full(caps[i], PAD_KEY, np.int32)
        pad_k[: len(cu)] = cu.astype(np.int32)
        level_keys.append(pad_k)
        parents.append(parent)
        fine_keys = cu
    return {"hp_level_keys": tuple(level_keys), "hp_parents": tuple(parents)}
