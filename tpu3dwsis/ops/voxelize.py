"""Fixed-shape voxelization: the TPU-native ``pointgroup_ops`` equivalent.

Replaces the reference's CPU/CUDA extension calls
``pointgroup_ops.voxelization_idx`` (point→voxel dedup map, built on CPU
inside collate, ``modules/datasets/scannetv2_dataset.py:449``) and
``pointgroup_ops.voxelization`` (mean feature pooling on GPU,
``train_scannetv2.py:189``) with a sort + segment-mean formulation that jits
with static shapes:

* unique voxel keys via ``jnp.unique(..., size=max_voxels)`` (sorted, padded
  with ``PAD_KEY``);
* point→voxel map via ``searchsorted`` on the sorted key table;
* mean pooling (reference ``mode=4``) via segment ops, with padded/invalid
  points routed to a dropped null slot.

The same segment-count machinery also serves the occupancy computation the
reference does by re-voxelizing instance masks (``test_scannetv2.py:386-390``,
``scannetv2_dataset.py:515-542``).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import hashgrid
from .hashgrid import PAD_KEY
from .segment import segment_count, segment_mean

__all__ = ["Voxelization", "voxelize_coords", "voxel_mean_pool", "count_occupied_voxels"]

# Unique-indices scatters (see merge_lookup._UNIQ) — A/B gate, default on.
_UNIQ = os.environ.get("TPU3DWSIS_UNIQ_SCATTER", "1") != "0"


class Voxelization(NamedTuple):
    """Result of voxelizing a (batched, padded) point set.

    Attributes:
      keys:        ``[M_pad]`` int32 sorted packed voxel keys, PAD_KEY padding.
      coords:      ``[M_pad, 4]`` int32 ``(b, x, y, z)`` voxel coords (garbage
                   rows where invalid — check ``valid``).
      valid:       ``[M_pad]`` bool, which voxel slots are real.
      num_voxels:  scalar int32, number of valid voxels.
      p2v:         ``[N]`` int32 point→voxel row map; invalid points map to
                   ``M_pad`` (the null slot, one past the end).
    """

    keys: jax.Array
    coords: jax.Array
    valid: jax.Array
    num_voxels: jax.Array
    p2v: jax.Array


def voxelize_coords(
    coords: jax.Array,
    spatial_shape: Sequence[int],
    max_batch: int,
    max_voxels: int,
    valid: jax.Array | None = None,
) -> Voxelization:
    """Deduplicate integer point coordinates ``[N, 4]`` into a padded voxel set.

    ``coords`` are already-discretized ``(batch, x, y, z)`` ints (the
    reference scales metric coords by ``scale=50`` → 2 cm voxels before
    calling ``voxelization_idx``). If more than ``max_voxels`` distinct
    voxels exist, the overflow voxels are silently dropped and the points
    mapping to them become invalid (callers pick ``max_voxels`` per shape
    bucket so this does not happen in practice).
    """
    keys = hashgrid.pack_coords(coords, spatial_shape, max_batch, valid=valid)
    # ONE argsort yields both the unique table and the point->voxel map
    # (first-occurrence compaction + inverse scatter) — the previous
    # unique(sort) + searchsorted(method='sort') formulation cost two more
    # full co-sorts per step at honest scale (~4M extra sorted elements).
    n = keys.shape[0]
    order = jnp.argsort(keys)
    ks = keys[order]
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    first = first & (ks != PAD_KEY)
    idx = jnp.cumsum(first.astype(jnp.int32)) - 1  # voxel row per sorted point
    in_cap = idx < max_voxels
    if _UNIQ:
        # first-occurrence targets are strictly increasing -> unique; the
        # rest (repeats / overflow) go to distinct slots past the table
        rowid = jnp.arange(n, dtype=jnp.int32)
        tgt = jnp.where(first & in_cap, idx, max_voxels + 1 + rowid)
        uniq = (
            jnp.full((max_voxels + 1 + n,), PAD_KEY, jnp.int32)
            .at[tgt].set(ks, mode="drop", unique_indices=True)[:max_voxels]
        )
    else:
        uniq = (
            jnp.full((max_voxels + 1,), PAD_KEY, jnp.int32)
            .at[jnp.where(first & in_cap, idx, max_voxels)]
            .set(ks, mode="drop")[:max_voxels]
        )
    p2v_s = jnp.where((ks != PAD_KEY) & in_cap, idx, max_voxels).astype(jnp.int32)
    # order is an argsort permutation -> trivially unique
    p2v = jnp.zeros((n,), jnp.int32).at[order].set(p2v_s, unique_indices=_UNIQ)
    vvalid = uniq != PAD_KEY
    num = jnp.sum(vvalid.astype(jnp.int32))
    vcoords = hashgrid.unpack_coords(jnp.where(vvalid, uniq, 0), spatial_shape, max_batch)
    return Voxelization(uniq, vcoords, vvalid, num, p2v)


def voxel_mean_pool(point_feats: jax.Array, p2v: jax.Array, max_voxels: int) -> jax.Array:
    """Mean-pool point features into their voxels (reference ``mode=4``).

    ``point_feats`` is ``[N, C]``; invalid points must map to ``max_voxels``
    in ``p2v`` — their null slot is computed then dropped. Returns
    ``[max_voxels, C]`` with zeros for empty voxel slots.
    """
    pooled = segment_mean(point_feats, p2v, max_voxels + 1)
    return pooled[:max_voxels]


def count_occupied_voxels(
    coords: jax.Array,
    group_ids: jax.Array,
    num_groups: int,
    spatial_shape: Sequence[int],
) -> jax.Array:
    """Number of distinct voxels occupied by each group of points.

    Segment-op replacement for the reference's trick of re-running
    ``voxelization_idx`` per instance mask to count voxels
    (``scannetv2_dataset.py:515-542``, ``test_scannetv2.py:386-390``):
    treat the group id as an extra leading coordinate so each (group, voxel)
    pair gets a distinct key, dedupe, and histogram keys by group.

    ``coords`` is ``[N, 4]`` with its batch column already folded into
    ``group_ids`` if needed; rows with ``group_ids`` outside
    ``[0, num_groups)`` are ignored. Returns float32 ``[num_groups]``.
    """
    g = group_ids.astype(jnp.int32)
    ok = (g >= 0) & (g < num_groups)
    coords4 = coords.at[:, 0].set(g)  # group replaces batch in the key
    keys = hashgrid.pack_coords(coords4, spatial_shape, num_groups, valid=ok)
    n = coords.shape[0]
    uniq = jnp.unique(keys, size=n, fill_value=PAD_KEY)
    uvalid = uniq != PAD_KEY
    sb = hashgrid.coord_strides(spatial_shape, num_groups)[0]
    ug = jnp.where(uvalid, uniq // sb, num_groups)
    return segment_count(ug, num_groups + 1)[:num_groups]
