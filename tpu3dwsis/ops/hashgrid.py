"""Packed voxel coordinate keys and sorted-table lookups.

The reference relies on spconv's GPU hash tables to map voxel coordinates to
row indices (rulebook construction).  TPUs have no device hash tables, so we
use the sort/searchsorted design instead (cf. Minuet, arXiv:2401.06145):

* a voxel's ``(batch, x, y, z)`` int coordinate is *packed* into a single
  int32 key (strides chosen so distinct in-range coords map to distinct
  keys);
* the active-voxel set is represented by the **sorted** array of its keys,
  padded to a fixed length with ``PAD_KEY`` (int32 max) so padding sorts to
  the end;
* point/neighbor lookups are ``searchsorted`` + equality check, giving the
  row index or a *miss* (mapped to the null row by callers).

Everything is fixed-shape and jit-able.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PAD_KEY", "pack_coords", "unpack_coords", "lookup", "coord_strides"]

# int32 max — padding key; sorts after every valid key.
PAD_KEY = np.int32(2**31 - 1)


def coord_strides(spatial_shape: Sequence[int], max_batch: int) -> Tuple[int, int, int, int]:
    """Row-major strides for packing ``(b, x, y, z)`` into one int32.

    Raises if the total key space does not fit in a (positive) int32.
    """
    sx, sy, sz = (int(s) for s in spatial_shape)
    total = max_batch * sx * sy * sz
    if total >= 2**31 - 1:  # reserve PAD_KEY
        raise ValueError(
            f"key space {max_batch}x{sx}x{sy}x{sz} = {total} overflows int32; "
            "reduce spatial_shape or max_batch"
        )
    return (sx * sy * sz, sy * sz, sz, 1)


def pack_coords(
    coords: jax.Array,
    spatial_shape: Sequence[int],
    max_batch: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Pack ``[N, 4]`` int ``(b, x, y, z)`` coords into int32 keys ``[N]``.

    Out-of-range coords (any component < 0 or >= shape) and invalid rows map
    to ``PAD_KEY``.
    """
    sb, sx, sy, sz = coord_strides(spatial_shape, max_batch)
    c = coords.astype(jnp.int32)
    b, x, y, z = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    shape = jnp.asarray([max_batch] + [int(s) for s in spatial_shape], dtype=jnp.int32)
    in_range = jnp.all((c >= 0) & (c < shape[None, :]), axis=1)
    if valid is not None:
        in_range = in_range & valid
    key = b * sb + x * sx + y * sy + z * sz
    return jnp.where(in_range, key, PAD_KEY)


def unpack_coords(
    keys: jax.Array, spatial_shape: Sequence[int], max_batch: int
) -> jax.Array:
    """Inverse of :func:`pack_coords` for valid keys. ``[N] -> [N, 4]``."""
    sb, sx, sy, sz = coord_strides(spatial_shape, max_batch)
    k = keys
    b = k // sb
    r = k - b * sb
    x = r // sx
    r = r - x * sx
    y = r // sy
    z = r - y * sy
    return jnp.stack([b, x, y, z], axis=1)


def lookup(sorted_keys: jax.Array, query_keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Find each query key in a sorted (PAD_KEY-padded) key table.

    Returns ``(idx, found)`` where ``idx[i]`` is the row of ``query_keys[i]``
    in ``sorted_keys`` (clipped to the table) and ``found[i]`` is whether it
    is an exact hit.  Queries equal to PAD_KEY always miss.
    """
    m = sorted_keys.shape[0]
    # method='sort' lowers to one co-sort instead of a 17-round binary-search
    # gather loop — far faster on TPU for these sizes (the rulebook build
    # issues 27×M queries per U-Net level).
    pos = jnp.searchsorted(sorted_keys, query_keys, side="left", method="sort").astype(
        jnp.int32
    )
    pos = jnp.minimum(pos, m - 1)
    found = (sorted_keys[pos] == query_keys) & (query_keys != PAD_KEY)
    return pos, found
