"""Neighbor-table ("rulebook") construction for sparse convolutions.

spconv builds GPU-hash-table rulebooks listing (input, output) index pairs
per kernel offset (``modules/model/sparse_unet3d.py:17-23,261-297`` call
sites).  The TPU formulation is dense-per-offset instead: for every kernel
offset ``k`` we store, for each *output* voxel row, the row index of the
input voxel it reads (or a *null* index = ``M_in`` on miss).  A sparse conv
is then ``K`` gather→matmul→accumulate steps — large, static-shape matmuls
that tile straight onto the MXU, with no per-edge bookkeeping.

Tables are pure functions of the active-coordinate sets, so they jit and are
built once per U-Net level per batch; the reference's ``indice_key`` sharing
(submanifold convs of one level share one table; the inverse conv reuses the
downsample table transposed) falls out structurally: the tables live in a
:class:`UNetPlan` that the network consumes.
"""
from __future__ import annotations

import itertools
import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hashgrid
from .hashgrid import PAD_KEY

# Unique-indices scatters (see merge_lookup._UNIQ): misses/overflow rows are
# routed to distinct throwaway slots instead of one shared dump slot, so XLA
# can take its vectorized unique-scatter path instead of the serialized
# general one.  A/B gate, default on.  (Measured on hardware: raw 1-D scatter
# cost is ~7 ns/row REGARDLESS of uniqueness declaration — the flag is kept
# as a no-regression default, the real plan-construction win is the band
# kernel below.)
_UNIQ = os.environ.get("TPU3DWSIS_UNIQ_SCATTER", "1") != "0"

# Band-merge Pallas kernel for the negative-half offset lookups: ONE kernel
# per level instead of 13 merge_lookups (44.5 ms each at L0 bench scale —
# their chunk slicing lowers to XLA row gathers).  See ops/pallas_band.py.
# Modes: "1" (on, TPU backends), "0" (off), "interpret" (on everywhere via
# the Pallas interpreter — tests monkeypatch this to cover the band path).
_BAND_MODE = os.environ.get("TPU3DWSIS_BANDMERGE", "1")
_BAND_TILE = int(os.environ.get("TPU3DWSIS_BAND_TILE", "256"))
_BAND_WINDOW = int(os.environ.get("TPU3DWSIS_BAND_WINDOW", "512"))


def _band_ok(m: int) -> bool:
    if _BAND_MODE == "0" or m % _BAND_TILE or m < _BAND_WINDOW:
        return False
    if _BAND_MODE == "interpret":
        return True
    return jax.default_backend() in ("tpu", "axon")

__all__ = [
    "subm_offsets",
    "down_offsets",
    "VoxelLevel",
    "LevelPlan",
    "UNetPlan",
    "build_subm_table",
    "build_downsample",
    "invert_down_link",
    "link_levels",
    "build_unet_plan",
    "build_unet_plan_from_levels",
]


def subm_offsets(kernel_size: int = 3) -> np.ndarray:
    """Kernel offsets for a submanifold conv, ``[K, 3]`` int32, row-major in
    ``(dx, dy, dz)``, range ``[-(k//2), k//2]``.  K = k**3."""
    r = kernel_size // 2
    return np.array(
        list(itertools.product(range(-r, r + 1), repeat=3)), dtype=np.int32
    )


def down_offsets() -> np.ndarray:
    """Offsets for the k=2 s=2 downsample conv: child position = 2*parent + o,
    o in {0,1}^3, row-major ``(dx, dy, dz)``. K = 8."""
    return np.array(list(itertools.product(range(2), repeat=3)), dtype=np.int32)


class VoxelLevel(NamedTuple):
    """Active voxel set at one U-Net resolution (padded, sorted by key)."""

    keys: jax.Array  # [M] int32 sorted, PAD_KEY padding
    coords: jax.Array  # [M, 4] int32 (b, x, y, z)
    valid: jax.Array  # [M] bool


class LevelPlan(NamedTuple):
    """Everything one U-Net level needs: its voxels, the shared submanifold
    neighbor table, and (if not the deepest level) the k2s2 down link.

    ``parent``/``child_offset`` are the inverse view of ``down_nbr``: for each
    fine row, its coarse row (``M_coarse`` = miss) and which of the 8 k2s2
    kernel offsets it occupies — the inverse conv is then a pure gather
    (``sparse_conv.inverse_conv``) instead of a scatter."""

    level: VoxelLevel
    subm_nbr: jax.Array  # [27, M] int32 input row per (offset, output row); M = miss
    down_nbr: jax.Array | None  # [8, M_coarse] fine row per (offset, coarse row)
    parent: jax.Array | None  # [M_fine] coarse row of each fine voxel
    child_offset: jax.Array | None  # [M_fine] k2s2 offset index (0..7)


class UNetPlan(NamedTuple):
    levels: Tuple[LevelPlan, ...]


def _query_table(
    level: VoxelLevel,
    query_coords: jax.Array,
    query_valid: jax.Array,
    spatial_shape: Sequence[int],
    max_batch: int,
) -> jax.Array:
    """Look up ``[Q, 4]`` coords in a level's sorted key table → ``[Q]`` row
    indices, with misses and invalid queries mapped to ``M`` (null)."""
    m = level.keys.shape[0]
    qkeys = hashgrid.pack_coords(query_coords, spatial_shape, max_batch, valid=query_valid)
    pos, found = hashgrid.lookup(level.keys, qkeys)
    return jnp.where(found, pos, m).astype(jnp.int32)


def build_subm_table(
    level: VoxelLevel,
    spatial_shape: Sequence[int],
    max_batch: int,
    kernel_size: int = 3,
) -> jax.Array:
    """Neighbor table for a submanifold conv at one level: ``[K, M]``.

    Output sites are exactly the active sites (submanifold semantics —
    spconv's ``SubMConv3d``); offset k's entry for output row m is the row of
    the voxel at ``coords[m] + offsets[k]`` or ``M`` if inactive.

    Each negative-half offset's queries are the (sorted) level keys plus a
    constant packed delta — themselves sorted — so positions come from the
    O(M) merge-path lookup instead of a searchsorted co-sort (which paid
    ~14·M log² compare rounds per level per step).  Out-of-range shifts can
    alias other rows' keys (coordinate wraparound); a per-axis bounds mask
    kills those hits.
    """
    from .merge_lookup import merge_lookup

    offsets_np = subm_offsets(kernel_size)  # [K, 3]
    k = offsets_np.shape[0]
    m = level.coords.shape[0]
    assert k % 2 == 1, "symmetric kernels only"
    half = k // 2  # offsets[half] == (0,0,0); offsets[K-1-i] == -offsets[i]

    # Query only the negative half — the positive half is the INVERSE
    # matching (m's neighbor at +d is j  ⟺  j's at -d is m), recovered by an
    # int32 scatter.  All negative-half packed deltas are < 0 (x-major key
    # order), so PAD_KEY rows stay maximal and the shifted key array stays
    # sorted.
    strides = np.asarray(hashgrid.coord_strides(spatial_shape, max_batch)[1:], np.int64)
    shape_arr = jnp.asarray([int(s) for s in spatial_shape], jnp.int32)
    rows = jnp.arange(m, dtype=jnp.int32)
    center = jnp.where(level.valid, rows, m)[None, :]

    def masked(i, pos, found):
        shifted = level.coords[:, 1:] + jnp.asarray(offsets_np[i], jnp.int32)[None, :]
        in_range = jnp.all((shifted >= 0) & (shifted < shape_arr[None, :]), axis=1)
        ok = found & in_range & level.valid & (level.keys != PAD_KEY)
        return jnp.where(ok, pos, m).astype(jnp.int32)

    if _band_ok(m):
        # ONE Pallas band-merge kernel for ALL non-center offsets (positive
        # deltas break merge_lookup's global-sortedness requirement at the
        # PAD tail, but the band kernel only needs per-tile window locality
        # + the prefetched lower bound — PAD rows are masked and the tail is
        # skipped).  Shared windows per dx plane: groups (9, 8, 9), the
        # dx=0 group excluding the center offset.
        from .pallas_band import band_subm_lookup

        idxs = [i for i in range(k) if i != half]
        deltas = tuple(
            int((strides * offsets_np[i].astype(np.int64)).sum()) for i in idxs
        )
        dx_vals = [int(offsets_np[i][0]) for i in idxs]
        gsizes = tuple(dx_vals.count(v) for v in sorted(set(dx_vals)))
        pos_all = band_subm_lookup(
            level.keys, deltas, gsizes, tile=_BAND_TILE, window=_BAND_WINDOW,
            interpret=_BAND_MODE == "interpret",
        )
        tables = [masked(i, pos_all[j], pos_all[j] < m) for j, i in enumerate(idxs)]
        return jnp.concatenate(
            [jnp.stack(tables[:half]), center, jnp.stack(tables[half:])], axis=0
        )

    # XLA path: negative-half merge lookups + positive half by inversion
    deltas = [int((strides * offsets_np[i].astype(np.int64)).sum()) for i in range(half)]
    assert all(d < 0 for d in deltas), deltas
    neg_rows = []
    for i in range(half):
        pos, found = merge_lookup(level.keys, level.keys + jnp.int32(deltas[i]))
        neg_rows.append(masked(i, pos, found))
    neg = jnp.stack(neg_rows)

    def invert(nbr_k):
        # hit targets are injective (distinct output coords -> distinct
        # neighbor rows); misses (= m) are spread over slots [m+1, 2m+1)
        if _UNIQ:
            tgt = jnp.where(nbr_k == m, m + 1 + rows, nbr_k)
            inv = jnp.full((2 * m + 1,), m, jnp.int32).at[tgt].set(
                rows, mode="drop", unique_indices=True)
        else:
            inv = jnp.full((m + 1,), m, jnp.int32).at[nbr_k].set(rows, mode="drop")
        return inv[:m]

    pos = jax.vmap(invert)(neg)[::-1]  # offsets[K-1-i] table = invert(offsets[i])
    return jnp.concatenate([neg, center, pos], axis=0)


def build_downsample(
    fine: VoxelLevel,
    spatial_shape: Sequence[int],
    max_batch: int,
    max_voxels_out: int,
) -> Tuple[VoxelLevel, jax.Array]:
    """Coarse level + k2s2 link table from a fine level.

    Coarse active set = unique ``floor(coords/2)`` of fine actives (spconv
    ``SparseConv3d(kernel_size=2, stride=2)`` semantics). Returns
    ``(coarse_level, down_nbr[8, M_out])`` where ``down_nbr[k][m]`` is the
    fine row at ``2*coarse_coords[m] + down_offsets()[k]`` (or ``M_fine``).
    The same table drives the inverse conv (``SparseInverseConv3d`` sharing
    the ``indice_key``, ``sparse_unet3d.py:292-297``) as a scatter.
    """
    coarse_shape = tuple((int(s) + 1) // 2 for s in spatial_shape)
    cc = fine.coords.at[:, 1:].set(fine.coords[:, 1:] // 2)
    ckeys = hashgrid.pack_coords(cc, coarse_shape, max_batch, valid=fine.valid)
    # NOTE: ``ckeys`` is NOT globally sorted even though ``fine.keys`` is —
    # floor-halving carries across axis boundaries (fine (2,7,7) < (3,1,6)
    # but halved (1,3,3) > (1,0,3)); it is only piecewise-sorted over the 8
    # per-axis parity classes, so the unique needs a real sort.  (A sort-free
    # host-precomputed variant A/B-measured within noise and was removed, r5.)
    # The unique's own sort already knows every row's slot: return_inverse
    # IS the parent map (a separate searchsorted would pay another
    # (M_fine + M_coarse) co-sort per level per step).
    uniq, inv = jnp.unique(
        ckeys, size=max_voxels_out, fill_value=PAD_KEY, return_inverse=True
    )
    cvalid = uniq != PAD_KEY
    ccoords = hashgrid.unpack_coords(jnp.where(cvalid, uniq, 0), coarse_shape, max_batch)
    coarse = VoxelLevel(keys=uniq, coords=ccoords, valid=cvalid)

    ppos = jnp.minimum(inv.astype(jnp.int32), max_voxels_out - 1)
    # re-check the hit: PAD rows and capacity-overflow truncation must drop
    pfound = uniq[ppos] == ckeys
    parent = jnp.where(pfound & fine.valid, ppos, max_voxels_out).astype(jnp.int32)
    rel = fine.coords[:, 1:] % 2
    child_offset = ((rel[:, 0] * 2 + rel[:, 1]) * 2 + rel[:, 2]).astype(jnp.int32)

    down_nbr = invert_down_link(parent, child_offset, max_voxels_out)
    return coarse, down_nbr, parent, child_offset


def invert_down_link(
    parent: jax.Array, child_offset: jax.Array, max_voxels_out: int
) -> jax.Array:
    """``down_nbr`` is the inverse matching of (parent, child_offset): fine
    row i sits at ``(offset=child_offset[i], coarse=parent[i])`` — one int32
    scatter instead of an 8-offset co-sort lookup.  (child_offset, parent)
    is the fine voxel's identity → unique targets; overflow/invalid rows get
    distinct slots past the table."""
    m_fine = parent.shape[0]
    fr = jnp.arange(m_fine, dtype=jnp.int32)
    base = 8 * max_voxels_out
    if _UNIQ:
        flat_idx = jnp.where(
            parent >= max_voxels_out, base + 1 + fr,
            child_offset * max_voxels_out + parent)
        down_flat = (
            jnp.full((base + 1 + m_fine,), m_fine, jnp.int32)
            .at[flat_idx].set(fr, mode="drop", unique_indices=True))
    else:
        flat_idx = jnp.where(
            parent >= max_voxels_out, base, child_offset * max_voxels_out + parent)
        down_flat = (
            jnp.full((base + 1,), m_fine, jnp.int32)
            .at[flat_idx].set(fr, mode="drop"))
    return down_flat[:base].reshape(8, max_voxels_out)


def link_levels(
    fine: VoxelLevel,
    coarse: VoxelLevel,
    spatial_shape: Sequence[int],
    max_batch: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """k2s2 link tables between two *given* levels (the spatially-sharded
    path supplies both level sets — coarse halo voxels cannot be derived
    locally from a width-1 fine halo — instead of deriving the coarse set
    like :func:`build_downsample`).  Returns ``(down_nbr, parent,
    child_offset)`` with the same conventions as ``build_downsample``.
    """
    coarse_shape = tuple((int(s) + 1) // 2 for s in spatial_shape)
    max_voxels_out = coarse.keys.shape[0]
    cc = fine.coords.at[:, 1:].set(fine.coords[:, 1:] // 2)
    ckeys = hashgrid.pack_coords(cc, coarse_shape, max_batch, valid=fine.valid)
    ppos, pfound = hashgrid.lookup(coarse.keys, ckeys)
    parent = jnp.where(pfound & fine.valid, ppos, max_voxels_out).astype(jnp.int32)
    rel = fine.coords[:, 1:] % 2
    child_offset = ((rel[:, 0] * 2 + rel[:, 1]) * 2 + rel[:, 2]).astype(jnp.int32)

    down_nbr = invert_down_link(parent, child_offset, max_voxels_out)
    return down_nbr, parent, child_offset


def build_unet_plan_from_levels(
    levels: Sequence[VoxelLevel],
    spatial_shape: Sequence[int],
    max_batch: int,
) -> UNetPlan:
    """Like :func:`build_unet_plan` but with every level's active set given
    (used by the spatial-sharding path, where each level includes halo rows
    supplied by the host partitioner)."""
    plans = []
    shape = tuple(int(s) for s in spatial_shape)
    for i, level in enumerate(levels):
        subm = build_subm_table(level, shape, max_batch)
        if i + 1 < len(levels):
            down_nbr, parent, child_offset = link_levels(
                level, levels[i + 1], shape, max_batch
            )
        else:
            down_nbr, parent, child_offset = None, None, None
        plans.append(
            LevelPlan(
                level=level,
                subm_nbr=subm,
                down_nbr=down_nbr,
                parent=parent,
                child_offset=child_offset,
            )
        )
        shape = tuple((s + 1) // 2 for s in shape)
    return UNetPlan(levels=tuple(plans))


def build_unet_plan(
    level0: VoxelLevel,
    spatial_shape: Sequence[int],
    max_batch: int,
    num_levels: int,
    level_sizes: Sequence[int],
) -> UNetPlan:
    """Build all per-level tables for a ``num_levels``-deep U-Net.

    ``level_sizes[i]`` is the static padded voxel capacity of level ``i``
    (level 0 must equal ``level0.keys.shape[0]``).  Mirrors the recursive
    table construction spconv performs lazily inside ``UBlock``
    (``sparse_unet3d.py:213-350``), done eagerly here so the whole forward is
    one traced computation.
    """
    assert len(level_sizes) == num_levels
    assert level0.keys.shape[0] == level_sizes[0]
    plans = []
    level = level0
    shape = tuple(int(s) for s in spatial_shape)
    for i in range(num_levels):
        subm = build_subm_table(level, shape, max_batch)
        if i + 1 < num_levels:
            coarse, down_nbr, parent, child_offset = build_downsample(
                level, shape, max_batch, level_sizes[i + 1]
            )
        else:
            coarse, down_nbr, parent, child_offset = None, None, None, None
        plans.append(
            LevelPlan(
                level=level,
                subm_nbr=subm,
                down_nbr=down_nbr,
                parent=parent,
                child_offset=child_offset,
            )
        )
        if coarse is not None:
            level = coarse
            shape = tuple((s + 1) // 2 for s in shape)
    return UNetPlan(levels=tuple(plans))
