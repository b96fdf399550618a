"""Spatial sharding: whole-scene inference over a device mesh axis.

BASELINE config 5 / SURVEY §5.7's "long-context" axis: scenes of 10M+
points exceed one chip's HBM, so the voxel/point rows are sharded into
**x-axis slabs** across devices.  This is a genuinely new parallelism design
(the CUDA reference has nothing — it crops scenes to 250k points instead):

* **slab alignment**: boundaries are multiples of ``2^(levels-1)``, so the
  whole k2s2 downsample ladder keeps parent/child pairs on one device —
  down and inverse convs are purely local, forever;
* **halo exchange**: only the 3³ submanifold convs read across a boundary.
  Each shard's local sorted key table additionally contains the one-voxel
  halo planes of its neighbors (keys are x-major, so halo rows sort to the
  two ends of the owned range); after every conv a ``lax.ppermute`` over
  the mesh axis overwrites halo rows with their owners' values.  Elementwise
  ops (eval BN, ReLU, residual adds) keep halo copies consistent for free,
  so one exchange per conv is exactly sufficient;
* **superpoints**: points are sharded with their slab; superpoints straddle
  boundaries, so pooling psums partial sums/counts over the axis and the
  (small) ECC + heads stage runs replicated on every device.

The flax parameter tree is untouched — single-chip checkpoints run sharded
and vice versa.  Eval-mode only (training BN stats would need one more psum;
the training path scales by data parallelism instead, ``dist/mesh.py``).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

from ..core.containers import SceneBatch
from ..ops.hashgrid import PAD_KEY

__all__ = [
    "HaloLevel",
    "SpatialBatch",
    "build_spatial_batch",
    "make_spatial_forward",
    "spatial_forward",
]


class HaloLevel(NamedTuple):
    """One U-Net level's per-shard voxel rows + halo exchange maps.

    All arrays are stacked ``[D, ...]`` over shards.  ``Ml`` is the padded
    local row capacity, ``Hl`` the padded halo-plane capacity.  Row index
    ``Ml`` acts as the null slot for sends (reads zeros) and receives
    (dropped scatter).
    """

    keys: np.ndarray  # [D, Ml] int32 sorted, PAD_KEY padded
    coords: np.ndarray  # [D, Ml, 4]
    valid: np.ndarray  # [D, Ml] present rows (owned + halo)
    owned: np.ndarray  # [D, Ml] owned rows only
    send_left: np.ndarray  # [D, Hl] rows of the owned x==x0 plane (→ left nbr)
    send_right: np.ndarray  # [D, Hl] rows of the owned x==x1-1 plane (→ right nbr)
    recv_left: np.ndarray  # [D, Hl] halo rows filled from the left neighbor
    recv_right: np.ndarray  # [D, Hl] halo rows filled from the right neighbor


class SpatialBatch(NamedTuple):
    levels: Tuple[HaloLevel, ...]
    batches: SceneBatch  # every field stacked [D, ...]; sp/edge fields replicated
    spatial_shape: Tuple[int, int, int]
    max_batch: int


def _round_up(x: int, mult: int) -> int:
    return int(-(-max(x, 1) // mult) * mult)


def _pack_np(coords: np.ndarray, spatial_shape, max_batch: int) -> np.ndarray:
    sx, sy, sz = (int(s) for s in spatial_shape)
    return (
        coords[:, 0].astype(np.int64) * (sx * sy * sz)
        + coords[:, 1].astype(np.int64) * (sy * sz)
        + coords[:, 2].astype(np.int64) * sz
        + coords[:, 3].astype(np.int64)
    ).astype(np.int32)


def build_spatial_batch(
    batch_arrays: dict,
    spatial_shape: Sequence[int],
    max_batch: int,
    n_shards: int,
    num_levels: int,
    pad_mult: int = 256,
) -> SpatialBatch:
    """Partition one collated batch (the dict from ``data.collate.collate``)
    into ``n_shards`` x-slabs with per-level halos and exchange maps.

    Pure host numpy — this is collate-scale preprocessing (one sort of the
    voxel keys per level), not device work.
    """
    shape = tuple(int(s) for s in spatial_shape)
    align = 1 << (num_levels - 1)
    pcoords = np.asarray(batch_arrays["point_coords"])
    pvalid = np.asarray(batch_arrays["point_valid"])

    # global level-0 voxel set
    keys0 = _pack_np(pcoords, shape, max_batch)
    keys0 = keys0[pvalid]
    uniq0 = np.unique(keys0)

    def unpack(keys, shp):
        sxx, syy, szz = shp
        b = keys // (sxx * syy * szz)
        r = keys % (sxx * syy * szz)
        x = r // (syy * szz)
        r = r % (syy * szz)
        y = r // szz
        z = r % szz
        return np.stack([b, x, y, z], axis=1).astype(np.int32)

    lvl_coords = [unpack(uniq0, shape)]
    lvl_shape = [shape]
    for _ in range(1, num_levels):
        prev = lvl_coords[-1]
        shp = tuple((s + 1) // 2 for s in lvl_shape[-1])
        cc = prev.copy()
        cc[:, 1:] //= 2
        k = _pack_np(cc, shp, max_batch)
        lvl_coords.append(unpack(np.unique(k), shp))
        lvl_shape.append(shp)

    # slab boundaries on x, aligned, balancing level-0 voxel counts
    x0v = lvl_coords[0][:, 1]
    max_x = int(x0v.max()) + 1 if len(x0v) else align
    nblocks = -(-max_x // align)
    hist = np.bincount(np.minimum(x0v // align, nblocks - 1), minlength=nblocks)
    cum = np.cumsum(hist)
    total = cum[-1]
    cuts = [0]
    for d in range(1, n_shards):
        target = total * d / n_shards
        cuts.append(int(np.searchsorted(cum, target)) + 1)
    cuts.append(nblocks)
    cuts = np.maximum.accumulate(np.asarray(cuts))
    if nblocks < n_shards:
        raise ValueError(
            f"scene x-extent ({max_x} voxels, {nblocks} aligned blocks of "
            f"{align}) is too small to shard {n_shards} ways"
        )
    # Enforce STRICTLY increasing cuts: a dense x-band narrower than `align`
    # collapses count-balanced cuts into one block.  Distinct boundaries are
    # all halo correctness needs (3³ convs read ±1 plane, so every crossing
    # is between adjacent slabs; an occupancy-empty slab simply has empty
    # halo lists) — accept count imbalance instead of refusing.
    for i in range(1, n_shards):
        cuts[i] = max(int(cuts[i]), int(cuts[i - 1]) + 1)
    for i in range(n_shards - 1, 0, -1):
        cuts[i] = min(int(cuts[i]), int(cuts[i + 1]) - 1)
    bounds = cuts * align  # [D+1] x boundaries (level 0)
    assert np.all(np.diff(bounds) > 0)

    D = n_shards
    levels = []
    for l in range(num_levels):
        cl = lvl_coords[l]
        shp = lvl_shape[l]
        kl = _pack_np(cl, shp, max_batch)
        order = np.argsort(kl)
        cl, kl = cl[order], kl[order]
        xb = bounds >> l  # level-l boundaries (aligned: exact shifts)

        per_shard = []
        halo_sizes = []
        for d in range(D):
            x0, x1 = int(xb[d]), int(xb[d + 1])
            own = (cl[:, 1] >= x0) & (cl[:, 1] < x1)
            hl = cl[:, 1] == x0 - 1 if x0 > 0 else np.zeros(len(cl), bool)
            hr = cl[:, 1] == x1 if d + 1 < D else np.zeros(len(cl), bool)
            # left neighbor's send plane is its owned x==x0-1 (only if owned
            # by d-1, i.e. x0-1 >= xb[d-1]); alignment guarantees that
            sel = own | hl | hr
            per_shard.append((own[sel], hl[sel], hr[sel], cl[sel], kl[sel]))
            halo_sizes.append(max(int(hl.sum()), int(hr.sum())))

        ml = _round_up(max(len(p[3]) for p in per_shard), pad_mult)
        hl_cap = _round_up(max(halo_sizes + [1]), 8)
        keys_a = np.full((D, ml), PAD_KEY, np.int32)
        coords_a = np.zeros((D, ml, 4), np.int32)
        valid_a = np.zeros((D, ml), bool)
        owned_a = np.zeros((D, ml), bool)
        sl_a = np.full((D, hl_cap), ml, np.int32)
        sr_a = np.full((D, hl_cap), ml, np.int32)
        rl_a = np.full((D, hl_cap), ml, np.int32)
        rr_a = np.full((D, hl_cap), ml, np.int32)
        for d, (own, hl_m, hr_m, cc, kk) in enumerate(per_shard):
            n = len(kk)
            keys_a[d, :n] = kk
            coords_a[d, :n] = cc
            valid_a[d, :n] = True
            owned_a[d, :n] = own
            rows = np.arange(n, dtype=np.int32)
            x0, x1 = int(xb[d]), int(xb[d + 1])
            # my boundary planes (owned) — send order: ascending local key.
            # Edge shards have no neighbor on that side: their boundary plane
            # is never delivered (non-cyclic ppermute pairs) and can exceed
            # the halo capacity (which is sized from RECEIVE planes — equal
            # to the interior senders' planes by alignment), so skip it.
            sl = rows[own & (cc[:, 1] == x0)] if d > 0 else rows[:0]
            sr = rows[own & (cc[:, 1] == x1 - 1)] if d + 1 < D else rows[:0]
            sl_a[d, : len(sl)] = sl
            sr_a[d, : len(sr)] = sr
            rl = rows[hl_m]
            rr = rows[hr_m]
            rl_a[d, : len(rl)] = rl
            rr_a[d, : len(rr)] = rr
        levels.append(
            HaloLevel(keys_a, coords_a, valid_a, owned_a, sl_a, sr_a, rl_a, rr_a)
        )

    # ---- points: partition by slab, sp/edge fields replicated ----
    np_cap = _round_up(
        max(
            int(((pcoords[pvalid, 1] >= bounds[d]) & (pcoords[pvalid, 1] < bounds[d + 1])).sum())
            for d in range(D)
        ),
        pad_mult,
    )
    point_fields = {
        "point_coords", "point_xyz", "point_rgb", "point_valid",
        "point_sp", "point_sem", "point_ins",
    }
    n_sp_cap = len(np.asarray(batch_arrays["sp_valid"]))
    stacked = {}
    for name in SceneBatch._fields:
        # every field is required; a missing one is a collate bug and must
        # KeyError here rather than a shape error in the forward
        raw = batch_arrays[name]
        a = np.asarray(raw)
        if name in point_fields:
            out = np.zeros((D, np_cap) + a.shape[1:], a.dtype)
            if name == "point_sp":
                out[:] = n_sp_cap  # null superpoint
            if name in ("point_sem", "point_ins"):
                out[:] = -100
            for d in range(D):
                m = pvalid & (pcoords[:, 1] >= bounds[d]) & (pcoords[:, 1] < bounds[d + 1])
                out[d, : int(m.sum())] = a[m]
            stacked[name] = out
        else:
            stacked[name] = np.broadcast_to(a, (D,) + a.shape).copy()
    return SpatialBatch(
        levels=tuple(levels),
        batches=SceneBatch(**stacked),
        spatial_shape=shape,
        max_batch=max_batch,
    )


def _make_refresh(lv, axis: str, n_shards: int):
    """Halo refresh closure for one level: overwrite halo rows with the
    owners' values via two ppermutes (left→right and right→left planes)."""
    import jax
    import jax.numpy as jnp

    perm_r = [(i, i + 1) for i in range(n_shards - 1)]
    perm_l = [(i + 1, i) for i in range(n_shards - 1)]

    def refresh(x):
        xn = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
        from_left = jax.lax.ppermute(xn[lv.send_right], axis, perm_r)
        from_right = jax.lax.ppermute(xn[lv.send_left], axis, perm_l)
        x = x.at[lv.recv_left].set(from_left, mode="drop")
        x = x.at[lv.recv_right].set(from_right, mode="drop")
        return x

    return refresh


def make_spatial_forward(model, mesh, spatial_shape, max_batch: int, axis: str = "space"):
    """Build the jitted sharded eval forward ``fn(params, batch_stats,
    levels_stacked, batches_stacked) -> outs``.  Reuse the returned callable
    across calls (its jit cache keys on array shapes) — re-wrapping per call
    would recompile every time."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from ..nn.network import Preprocessed, SpatialCtx
    from ..ops import hashgrid, voxelize
    from ..ops.rulebook import VoxelLevel, build_unet_plan_from_levels
    from ..ops.segment import segment_count, segment_sum

    n_shards = mesh.shape[axis]
    shape = tuple(int(s) for s in spatial_shape)

    def fwd(params, batch_stats, levels_st, batch_st):
        levels = jax.tree_util.tree_map(lambda a: a[0], levels_st)
        batch = jax.tree_util.tree_map(lambda a: a[0], batch_st)
        vox_levels = [VoxelLevel(lv.keys, lv.coords, lv.valid) for lv in levels]
        plan = build_unet_plan_from_levels(vox_levels, shape, max_batch)
        refreshes = tuple(_make_refresh(lv, axis, n_shards) for lv in levels)

        feats = batch.point_rgb
        if model.cfg.use_coords:
            feats = jnp.concatenate([feats, batch.point_xyz.astype(feats.dtype)], axis=1)
        m0 = levels[0].keys.shape[0]
        pkeys = hashgrid.pack_coords(batch.point_coords, shape, max_batch,
                                     valid=batch.point_valid)
        pos, found = hashgrid.lookup(levels[0].keys, pkeys)
        p2v = jnp.where(found, pos, m0).astype(jnp.int32)
        voxel_feats = voxelize.voxel_mean_pool(feats, p2v, m0)
        voxel_feats = refreshes[0](voxel_feats)

        s = batch.num_superpoints
        sums = segment_sum(batch.point_xyz, batch.point_sp, s + 1)
        cnt = segment_count(batch.point_sp, s + 1)
        sums, cnt = jax.lax.psum((sums, cnt), axis)
        sp_center = sums[:s] / jnp.maximum(cnt[:s, None], 1e-12)

        pre = Preprocessed(plan, voxel_feats, p2v, feats, sp_center)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, pre, train=False, spatial=SpatialCtx(axis, refreshes),
        )

    # WSISNet's output keys are static; point-level outputs concatenate over
    # shards, superpoint/edge outputs are device-invariant (replicated)
    point_keys = {"semantic_scores", "point_feats"}
    out_keys = [
        "semantic_scores", "sp_semantic_scores", "pred_sp_offset_vectors",
        "pred_sp_occupancy", "pred_sp_ins_size", "edge_affinity",
        "sp_discriminative_feats", "point_feats",
    ]
    out_specs = {k: P(axis) if k in point_keys else P() for k in out_keys}

    try:
        f = shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=out_specs,
            check_vma=False,  # replicated outputs come from explicit psums
        )
    except TypeError:  # older jax: check_rep
        f = shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=out_specs,
            check_rep=False,
        )
    return jax.jit(f)


def spatial_forward(model, params, batch_stats, sb: SpatialBatch, mesh, axis: str = "space"):
    """One-shot convenience around :func:`make_spatial_forward`."""
    import jax
    import jax.numpy as jnp

    f = make_spatial_forward(model, mesh, sb.spatial_shape, sb.max_batch, axis=axis)
    levels_dev = jax.tree_util.tree_map(jnp.asarray, sb.levels)
    batches_dev = jax.tree_util.tree_map(jnp.asarray, sb.batches)
    return f(params, batch_stats, levels_dev, batches_dev)
