"""Pallas TPU band-merge lookup: all subm-rulebook offset lookups in ONE kernel.

Why: plan construction measured ~1.25 s of the 5.4 s train step
(`scripts/ablate_step.py` plan probes, `.ablate_r3_s3.log`), dominated by the
13 negative-half `merge_lookup` calls per U-Net level (44.5 ms each at L0 —
their chunk machinery lowers to XLA row gathers at ~13 ns/row, and every
scatter formulation floors at ~7 ns/row regardless of `unique_indices`).

Structure exploited (same monotonicity as `pallas_spconv2`): offset ``k``'s
queries are the sorted level keys plus a constant packed delta — so the
positions of a tile of ``T`` consecutive queries lie in a narrow window of
the table, whose start is known from a tiny XLA binary search on the tile's
first key.  The kernel then:

* reads the query tile as a static block (queries ARE the keys — nothing is
  materialized),
* DMAs one shared table window per dx-group (2 groups for the 13-offset
  negative half) as a ``[1, W]`` lane vector straight from a ``[1, M]`` view
  of the keys (lane-dim slices at 128-aligned offsets — the layout Mosaic
  accepts, no relayout),
* matches by a ``[T, 1] == [1, W]`` broadcast equality + iota dot — at most
  one hit per row since voxel keys are unique,
* writes positions to a static ``(K, T)`` output block — NO scatter at all.

Exactness: rows whose match falls outside the window get a ``m+1`` FAR
sentinel; the wrapper fixes them with capacity-batched binary searches
(same discipline as ``pallas_spconv2._far_rounds``), so overflow costs an
extra round instead of wrong tables.  Padding-tail tiles are skipped via the
same scalar-prefetch row count as the conv kernels.

Replaces the per-offset lookups in ``rulebook.build_subm_table``
(reference rulebook semantics: spconv GPU-hash rulebooks,
``modules/model/sparse_unet3d.py:17-23``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import PAD_KEY

__all__ = ["band_subm_lookup"]


def _band_kernel(m, t_tile, deltas, gsizes, w, nrows_ref, lo_ref, q_ref,
                 keys_hbm, pos_ref, win_ref, sem):
    t = pl.program_id(0)
    n_groups = len(gsizes)

    # skipped (padding-tail) tiles and non-hit rows read this default
    pos_ref[:] = jnp.full_like(pos_ref, m)

    @pl.when(t * t_tile < nrows_ref[0])
    def _compute():
        def dma(g):
            lo = pl.multiple_of(lo_ref[g, t], 128)
            return pltpu.make_async_copy(
                keys_hbm.at[:, pl.ds(lo, w)], win_ref.at[g], sem.at[g]
            )

        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()

        q = q_ref[0, :].reshape(t_tile, 1)  # raw keys of this tile
        real = (q != PAD_KEY)[:, 0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (t_tile, w), 1)

        k = 0
        for g, gs in enumerate(gsizes):
            copies[g].wait()
            win = win_ref[g]  # [1, W] sorted table slice
            lo_val = jnp.min(win)
            hi_val = jnp.max(win)  # sorted => first/last (PAD rows are max)
            for _ in range(gs):
                qk = q + deltas[k]  # [T, 1]
                eq = qk == win  # [T, W] broadcast equality
                found = jnp.sum(eq.astype(jnp.int32), axis=1) > 0  # [T]
                ploc = jnp.sum(jnp.where(eq, idx, 0), axis=1)  # [T]
                outside = (qk[:, 0] > hi_val) | (qk[:, 0] < lo_val)
                p = jnp.where(found, lo_ref[g, t] + ploc, m)
                p = jnp.where(~found & outside, m + 1, p)  # FAR sentinel
                pos_ref[k, :] = jnp.where(real, p, m).astype(jnp.int32)
                k += 1


@functools.partial(
    jax.jit, static_argnames=("deltas", "gsizes", "tile", "window", "interpret")
)
def _band_call(keys, nrows, lo, deltas, gsizes, tile, window, interpret):
    m = keys.shape[0]
    k = len(deltas)
    nt = m // tile
    keys_1m = keys.reshape(1, m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # nrows, lo
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # full keys for window DMAs
        ],
        out_specs=pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((len(gsizes), 1, window), keys.dtype),
            pltpu.SemaphoreType.DMA((len(gsizes),)),
        ],
    )
    kernel = functools.partial(_band_kernel, m, tile, deltas, gsizes, window)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, m), jnp.int32),
        interpret=interpret,
    )(nrows, lo, keys_1m, keys_1m)


def _compact_indices(flat, cap, fill, base):
    """True-entry indices with rank in [base, base+cap), padded with fill
    (cumsum + unique scatter; mirrors pallas_spconv2._compact_indices)."""
    n = flat.shape[0]
    rank = jnp.cumsum(flat.astype(jnp.int32)) - 1
    slot = jnp.where(flat & (rank >= base) & (rank < base + cap), rank - base, cap)
    return (
        jnp.full((cap + 1,), fill, jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    )


def band_subm_lookup(
    keys: jax.Array,  # [M] int32 sorted, PAD_KEY tail
    deltas,  # tuple[int], one packed key delta per negative-half offset
    gsizes,  # tuple[int], offsets per shared window (sum == len(deltas))
    tile: int = 256,
    window: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Positions of ``keys + deltas[k]`` in ``keys`` for every offset k.

    Returns ``[K, M]`` int32: position on hit, ``M`` on miss (including PAD
    rows).  Exact: window-missing rows are repaired by capacity-batched
    binary searches.
    """
    m = keys.shape[0]
    k = len(deltas)
    deltas = tuple(int(d) for d in deltas)
    gsizes = tuple(int(g) for g in gsizes)
    assert sum(gsizes) == k and m % tile == 0 and m >= window, (gsizes, k, m)

    # per-(group, tile) window starts: position of the tile's first query
    # under the group's smallest delta lower-bounds every member offset's
    # positions in the tile (keys sorted, deltas >= delta_min)
    nt = m // tile
    firsts = keys[:: tile]  # [nt]
    starts = []
    kk = 0
    for gs in gsizes:
        dmin = min(deltas[kk : kk + gs])
        b = jnp.searchsorted(keys, firsts + jnp.int32(dmin)).astype(jnp.int32)
        starts.append(jnp.clip((b // 128) * 128, 0, m - window))
        kk += gs
    lo = jnp.stack(starts)  # [G, nt]

    # skip the padding tail (keys are sorted with a PAD run at the end)
    anyreal = keys != PAD_KEY
    tail = jnp.cumprod(jnp.flip(~anyreal).astype(jnp.int32))
    nrows = (m - jnp.sum(tail)).astype(jnp.int32).reshape(1)

    pos = _band_call(keys, nrows, lo, deltas, gsizes, tile, window, interpret)

    # ---- exact fixup of FAR rows (sentinel m+1): batched binary searches
    far = (pos == m + 1).reshape(-1)
    n_far = jnp.sum(far.astype(jnp.int32))
    cap = max(1024, m // 64)
    deltas_arr = jnp.asarray(deltas, jnp.int32)
    pos_flat = pos.reshape(-1)

    def body(state):
        base, pf = state
        idx = _compact_indices(far, cap, k * m, base)
        live = idx < k * m
        kk_ = jnp.minimum(idx // m, k - 1)
        mm = jnp.where(live, idx % m, 0)
        q = keys[mm] + deltas_arr[kk_]
        p = jnp.clip(jnp.searchsorted(keys, q).astype(jnp.int32), 0, m - 1)
        hit = keys[p] == q
        val = jnp.where(hit, p, m)
        pf = pf.at[jnp.where(live, idx, k * m)].set(val, mode="drop")
        return base + cap, pf

    _, pos_flat = jax.lax.while_loop(
        lambda s: s[0] < n_far, body, (jnp.int32(0), pos_flat)
    )
    return pos_flat.reshape(k, m)
