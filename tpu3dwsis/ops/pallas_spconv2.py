"""Pallas TPU submanifold-conv kernel v2: windowed gather with overlapped DMA.

Why: XLA's row gather runs at ~12-15 ns/row on this hardware regardless of
row width — the 27-offset gather chain dominates the whole train step at
real-scan scale.  This kernel exploits the *monotone* rulebook structure
(sorted keys ⇒ for each offset, neighbor positions are non-decreasing in the
output row): a tile of T output rows reads a ~T-row contiguous window of the
input per offset, which moves at full HBM bandwidth as ONE DMA instead of T
row fetches.

v2 over the round-1 kernel (``pallas_spconv.py``):

* **all 27 offsets inside one kernel** with the fp32 accumulator resident in
  VMEM (one output write per tile, not per offset);
* **dx-grouped shared windows, all issued up front**: sorted keys are
  x-major, so one dx plane's 9 y/z offsets read windows within a few rows
  of each other (measured far fraction 0 at a shared 512-row window).  One
  DMA per dx group — 3 per tile instead of 27 — and every group's DMA is
  started before any compute, so the ~1 µs per-DMA latency (the measured
  bottleneck: per-tile time was invariant to a 4× window change) overlaps
  across groups and with the one-hot matmuls;
* **exact everywhere**: rows whose neighbor falls outside the window (rare:
  plane-size discontinuities, scene boundaries) are fixed up by a compacted
  XLA gather epilogue — no silent drops, no host-side fallback decision;
* **pos tables derived from the existing plan** — no extra lookups.

The local gather is a one-hot matmul on the MXU over the packed window
(``p = max(1, 128//C)`` rows per lane group; widths not dividing 128 run
unpacked with lanes padded to 128 multiples) — Mosaic's
``tpu.dynamic_gather`` still cannot index beyond the first tile here.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "derive_pos",
    "subm_conv_fwd",
    "subm_conv_bwd",
    "table_weight_grad",
]

# v3 forward (folded per-group weight precompute, see _fwd_kernel_v3): A/B
# gate until measured on hardware; applies only to packed widths (C<=64).
_FWD_V3 = os.environ.get("TPU3DWSIS_CONV_V3", "1") != "0"

# v3 forward extended to unpacked widths (p=1: C in {96, 128, 192, 256}).
# Same fold, no sub-row select needed; the per-group ``win @ wcat``
# precompute streams window-rows through the MXU, so it only pays when the
# window is short relative to the dots it removes (subm tables, window 512)
# — gated by ``window <= gs * tile`` at the call site.  A/B gate.
_FWD_V3P1 = os.environ.get("TPU3DWSIS_CONV_V3P1", "0") != "0"

# v4 backward (lane-concat single-dot per offset, see _bwd_kernel_v4): the
# kernel is matmul-issue bound, so producing the dW gather AND the folded dx
# candidates from ONE onehot dot against [window | window @ wcat] removes one
# of the two tile-height dots per offset.  A/B gate until measured.
_BWD_V4 = os.environ.get("TPU3DWSIS_CONV_BWD_V4", "0") != "0"

# Skip tiles past the last live table row.  Batch buckets pad every level's
# voxel tables to fit_statics capacity (~66% occupancy at bench batch 6), and
# collate packs scenes contiguously so padding is one sorted TAIL — those
# tiles are all-miss and contribute exactly zero, yet cost the same DMAs and
# MXU issue slots as live tiles.  A scalar-prefetch row count gates each
# tile's whole group loop (outputs still written: zeros).
_SKIP_PAD = os.environ.get("TPU3DWSIS_CONV_SKIP_PAD", "1") != "0"


def _active_rows(ok: jax.Array) -> jax.Array:
    """``[1]`` int32: table rows up to and including the last row with any
    hit.  Correct for ANY table (interleaved misses just mean no skip); the
    win case is the standard sorted-keys layout where padding rows are a
    trailing all-miss run."""
    m = ok.shape[1]
    if not _SKIP_PAD:
        return jnp.full((1,), m, jnp.int32)
    anyok = jnp.any(ok, axis=0)
    tail = jnp.cumprod(jnp.flip(~anyok).astype(jnp.int32))
    return (m - jnp.sum(tail)).astype(jnp.int32).reshape(1)


def derive_pos(nbr: jax.Array, num_src_rows: int):
    """(pos, ok) from a miss-folded neighbor table.  The kernel masks miss
    rows itself, so ``pos`` is just the raw table — no cummax repair needed
    (the old [K, M] cummax prelude cost more than the kernel)."""
    ok = nbr < num_src_rows
    return nbr.astype(jnp.int32), ok


def _group_offsets(k: int) -> int:
    """Offsets per shared window.  Sorted keys are x-major, so the 9 y/z
    offsets of one dx plane land within a few rows of each other — measured
    far fraction at a shared 512-row window is ZERO on real rulebooks
    (scripts/far_fraction.py).  Row-major offset enumeration makes each dx
    plane a contiguous K-range: 27→3 groups of 9, 8→2 groups of 4 (k2s2
    down tables), 9 (factorized asym kernels)→3 of 3 (dx-contiguous for the
    dy==0 slice, merely finer for the dx==0 slice)."""
    return {27: 9, 9: 3, 8: 4}.get(k, 1)


def _plan_windows(pos, ok, tile: int, window: int, p: int, mp: int, group_size: int = 1):
    """Window starts ``lo [K/group_size, nt]`` (aligned so ``lo/p`` is a
    multiple of the 16-sublane tile) and the ``far`` mask of rows the
    windows miss.

    ``lo`` = each (offset-group, tile)'s minimum hit position (hits are
    non-decreasing per offset so the min covers the whole tile from below);
    rows beyond ``lo + window`` land in ``far``.
    """
    k, m = pos.shape
    gs = max(int(group_size), 1)
    assert k % gs == 0, (k, gs)
    ng = k // gs
    nt = m // tile
    q = 16 * p
    hits = jnp.where(ok, pos, mp)
    lo = jnp.min(hits.reshape(ng, gs, nt, tile), axis=(1, 3))  # [G, nt]
    lo = (lo // q) * q
    hi = ((mp - window) // q) * q
    lo = jnp.clip(lo, 0, max(hi, 0)).astype(jnp.int32)
    local = pos.reshape(ng, gs, nt, tile) - lo[:, None, :, None]
    far = ok.reshape(ng, gs, nt, tile) & (local >= window)
    return lo, far.reshape(k, m)


def _fwd_kernel(c, gs, fuse, nrows_ref, lo_ref, pos_ref, ok_ref, xp_hbm, w_ref, st_ref, out_ref, acc_ref, win_ref, sem):
    t = pl.program_id(0)
    k_total = pos_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[1]  # packed window rows
    p = max(1, 128 // c)
    n_groups = k_total // gs  # w_ref is pre-reshaped [G, gs*C, D]

    def dma(g):
        lo = lo_ref[g, t]
        lo_p = pl.multiple_of(lo // p, 16)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(lo_p, wp), :], win_ref.at[g], sem.at[g]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # tiles past the last live row are all-miss (padding tail): skip their
    # DMAs and matmuls entirely, write the zeros below
    @pl.when(t * tile < nrows_ref[0])
    def _compute():
        # issue every group window up front so DMA latencies overlap each
        # other and the one-hot matmuls
        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()

        # static unroll over offsets: all ref indices (window group, weight
        # row, table row) stay compile-time constants, which Mosaic lowers
        # reliably.
        # NOTE: both matmuls here are M-bound (~T MXU cycles regardless of
        # K/N), so merging them across offsets cannot save cycles — and
        # concatenating narrow gathered tiles into wide operands costs lane
        # relayouts that measured ~25% SLOWER at train-step scale.  Keep one
        # gather + one weight matmul per offset.
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
        for g in range(n_groups):
            copies[g].wait()
            if fuse:
                # pre-activation BN+ReLU folded into the conv input: one VPU
                # affine on the window instead of a materialized [M, C] pass.
                # Computed in f32 (st_ref is f32) and rounded to the matmul
                # dtype only at the end — a bf16 pre-activation flips the
                # ReLU sign on rows where x*s+t straddles zero within bf16
                # rounding, which makes the backward's mask (and XLA's
                # excess-precision oracle) disagree by a full |dh·s| there.
                win_g = jnp.maximum(
                    win_ref[g].astype(jnp.float32) * st_ref[0:1, :] + st_ref[1:2, :], 0
                ).astype(win_ref.dtype)
            else:
                win_g = win_ref[g]
            for k in range(g * gs, (g + 1) * gs):
                local = pos_ref[k, :] - lo_ref[g, t]  # [T]
                ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
                sel_packed = jnp.where(ok, local // p, -1)  # -1 never matches
                onehot = iota == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
                g128 = jax.lax.dot_general(
                    onehot.astype(win_g.dtype),
                    win_g,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, lanes]
                sub = jnp.where(ok, local % p, -1)
                gath = jnp.zeros((tile, c), jnp.float32)
                for j in range(p):
                    pick = (sub == j).astype(jnp.float32)
                    gath = gath + jnp.broadcast_to(pick.reshape(tile, 1), (tile, c)) * g128[:, j * c : (j + 1) * c]
                acc_ref[:] += jax.lax.dot_general(
                    gath.astype(w_ref.dtype),
                    w_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _fold_weights(weights: jax.Array, p: int, gs: int, dtype, rows=None) -> jax.Array:
    """Per-group lane-concat of block-diagonal weights for the v3 forward.

    ``weights [K, C, D]`` → ``[G, rows, gs*seg]`` where each offset's
    ``[p*C, p*D]`` block-diagonal expansion (p copies of W on the diagonal,
    matching the window's p-row lane packing) occupies its own
    ``seg = roundup(p*D, 128)``-lane segment.  One ``window @ fold`` matmul
    then weights ALL of a group's packed candidate rows at once, replacing
    the per-offset ``[T, C] @ [C, D]`` weight matmuls — the kernel is
    matmul-issue bound, so fewer/earlier matmuls win even at equal FLOPs.
    ``rows`` (default ``p*C``) zero-pads the row dim to the window's padded
    lane count for the unpacked p=1 widths."""
    k, c, d = weights.shape
    ng = k // gs
    eye = jnp.eye(p, dtype=weights.dtype)
    wbd = jnp.einsum("ab,kcd->kacbd", eye, weights).reshape(k, p * c, p * d)
    seg = -(-(p * d) // 128) * 128
    rows = p * c if rows is None else rows
    wbd = jnp.pad(wbd, ((0, 0), (0, rows - p * c), (0, seg - p * d)))
    wcat = wbd.reshape(ng, gs, rows, seg).transpose(0, 2, 1, 3).reshape(ng, rows, gs * seg)
    return wcat.astype(dtype)


def _fwd_kernel_v3(c, d, gs, fuse, nrows_ref, lo_ref, pos_ref, ok_ref, xp_hbm, wcat_ref, st_ref, out_ref,
                   acc_ref, win_ref, sem):
    """v3 forward: the per-offset weight matmul is folded into ONE per-group
    precompute ``WV = window @ wcat`` ([wp, lanes] @ [lanes, gs*seg]), so each
    offset costs a single one-hot gather matmul against its WV segment.
    Packed widths (p*C == 128) select the candidate sub-row per output row
    with a lane mask; unpacked widths (p=1, C in {96, 128, 192, 256}) skip
    straight to the segment slice.  Per tile per group: 1 + gs matmuls
    instead of 2*gs, and the precompute's output height is ``wp`` (window
    rows), cutting MXU-issue cycles ~25% at L0/L1 (measured)."""
    t = pl.program_id(0)
    k_total = pos_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[1]
    p = max(1, 128 // c)
    seg = wcat_ref.shape[2] // gs
    n_groups = k_total // gs

    def dma(g):
        lo = lo_ref[g, t]
        lo_p = pl.multiple_of(lo // p, 16)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(lo_p, wp), :], win_ref.at[g], sem.at[g]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t * tile < nrows_ref[0])  # skip padding-tail tiles (see _fwd_kernel)
    def _compute():
        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()

        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
        for g in range(n_groups):
            copies[g].wait()
            if fuse:
                # f32 affine, rounded at the matmul input (see _fwd_kernel)
                win_g = jnp.maximum(
                    win_ref[g].astype(jnp.float32) * st_ref[0:1, :] + st_ref[1:2, :], 0
                ).astype(win_ref.dtype)
            else:
                win_g = win_ref[g]
            wv = jax.lax.dot_general(
                win_g,
                wcat_ref[g],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(win_ref.dtype)  # [wp, gs*seg]
            for k in range(g * gs, (g + 1) * gs):
                local = pos_ref[k, :] - lo_ref[g, t]
                ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
                sel_packed = jnp.where(ok, local // p, -1)
                onehot = iota == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
                kl = k - g * gs
                y = jax.lax.dot_general(
                    onehot.astype(win_ref.dtype),
                    wv[:, kl * seg : kl * seg + p * d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, p*d]: candidate j's weighted contribution in block j
                # select candidate sub-row j(t) per output row with ONE lane
                # mask (lane // d == sub) instead of p pick-broadcast rounds
                sub = jnp.where(ok, local % p, -1)
                lane_j = jax.lax.broadcasted_iota(jnp.int32, (tile, p * d), 1) // d
                mask = (lane_j == jnp.broadcast_to(sub.reshape(tile, 1), (tile, p * d))).astype(jnp.float32)
                y4 = y * mask
                contrib = y4[:, 0:d]
                for j in range(1, p):
                    contrib = contrib + y4[:, j * d : (j + 1) * d]
                acc_ref[:] += contrib

    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pack_affine(s, t, p: int, c: int, dtype):
    """``(s, t) [C]`` → ``[2, lanes]`` matching the window's p-row lane
    packing (padding lanes get s=0, t=0 so they stay zero after the affine)."""
    lanes = -(-(p * c) // 128) * 128
    st = jnp.zeros((2, lanes), dtype)
    st = st.at[0, : p * c].set(jnp.tile(s.astype(dtype), p))
    return st.at[1, : p * c].set(jnp.tile(t.astype(dtype), p))


@functools.partial(jax.jit, static_argnames=("d", "tile", "window", "gs", "fuse", "interpret"))
def _fwd_call_v3(feats, pos, ok, wcat, d, lo, nrows, st, tile, window, gs, fuse, interpret):
    k, m = pos.shape
    c = feats.shape[1]
    p = max(1, 128 // c)
    nt = m // tile
    ng = k // gs
    xp, mp = _pack(feats, p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed feats stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # folded weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2, lanes] affine
        ],
        out_specs=pl.BlockSpec((tile, d), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((ng, window // p, -(-(p * c) // 128) * 128), feats.dtype),
            pltpu.SemaphoreType.DMA((ng,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel_v3, c, d, gs, fuse)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), feats.dtype),
        interpret=interpret,
    )(nrows, lo, pos, ok.astype(jnp.int32), xp, wcat, st)


def _pack(feats: jax.Array, p: int):
    """[M, C] -> [ceil(M/p), lanes] row-packed for windowed DMAs; ``lanes``
    is ``p*C`` padded up to a multiple of 128 (Mosaic requires HBM slices
    lane-aligned to the 128 tiling — hit by the unpacked p=1 widths 96/160)."""
    m, c = feats.shape
    mp = -(-m // p) * p
    cp = -(-(p * c) // 128) * 128
    xp = jnp.zeros((mp, c), feats.dtype).at[:m].set(feats)
    xp = xp.reshape(mp // p, p * c)
    if cp != p * c:
        xp = jnp.concatenate(
            [xp, jnp.zeros((mp // p, cp - p * c), feats.dtype)], axis=1
        )
    return xp, mp


@functools.partial(jax.jit, static_argnames=("tile", "window", "gs", "fuse", "interpret"))
def _fwd_call(feats, pos, ok, weights, lo, nrows, st, tile, window, gs, fuse, interpret):
    k, m = pos.shape
    c, d = weights.shape[1], weights.shape[2]
    p = max(1, 128 // c)
    nt = m // tile
    ng = k // gs
    xp, mp = _pack(feats, p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # nrows, lo
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed feats stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2, lanes] affine
        ],
        out_specs=pl.BlockSpec((tile, d), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((ng, window // p, -(-(p * c) // 128) * 128), feats.dtype),
            pltpu.SemaphoreType.DMA((ng,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, c, gs, fuse)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), feats.dtype),
        interpret=interpret,
    )(nrows, lo, pos, ok.astype(jnp.int32), xp, weights, st)


def _compact_indices(flat: jax.Array, cap: int, fill: int, base=0) -> jax.Array:
    """Flat indices of the True entries with rank in ``[base, base+cap)``,
    padded with ``fill`` — via cumsum + scatter.  ``jnp.nonzero(size=...)``
    lowers to a full sort of the mask (hundreds of ms at 25M elements); this
    is three streaming passes."""
    n = flat.shape[0]
    rank = jnp.cumsum(flat.astype(jnp.int32)) - 1
    slot = jnp.where(flat & (rank >= base) & (rank < base + cap), rank - base, cap)
    return (
        jnp.full((cap + 1,), fill, jnp.int32)
        .at[slot]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    )


def _far_rounds(flat, cap, carry, round_fn):
    """Run ``round_fn(idx, carry)`` over capacity-sized batches of far rows
    until every far (k, m) pair is processed — exact regardless of how many
    rows the windows miss (no silent drops past the capacity).  The common
    case (n_far <= cap, usually n_far == 0) runs at most one round."""
    n_far = jnp.sum(flat.astype(jnp.int32))
    fill = flat.shape[0]

    def body(state):
        base, c = state
        idx = _compact_indices(flat, cap, fill, base)
        return base + cap, round_fn(idx, c)

    _, carry = jax.lax.while_loop(lambda s: s[0] < n_far, body, (jnp.int32(0), carry))
    return carry


def _far_correction_fwd(out, feats, nbr, weights, far, affine=None):
    """Add the contributions of rows whose neighbor fell outside the window:
    compact the (rare) far (k, m) pairs into fixed-size batches, gather,
    matmul per-row, scatter-add.  Batches of ``max(4096, M//32)`` repeat
    until all far rows are handled (``_far_rounds``), so overflow costs an
    extra round instead of corrupting the output.  ``affine`` mirrors the
    kernel's fused input BN+ReLU on the gathered rows."""
    k, m = nbr.shape
    cap = max(4096, m // 32)
    c, d = weights.shape[1], weights.shape[2]
    flat = far.reshape(-1)
    out_f = jnp.concatenate(
        [out.astype(jnp.float32), jnp.zeros((1, out.shape[1]), jnp.float32)]
    )

    def one_round(idx, acc):
        kk = jnp.minimum(idx // m, k - 1)
        mm = jnp.where(idx < k * m, idx % m, m)  # m = dropped row
        src = jnp.where(idx < k * m, nbr[kk, jnp.minimum(mm, m - 1)], feats.shape[0] - 1)
        g = feats[src]  # [cap, C]
        if affine is not None:
            s, t = affine
            # f32 affine rounded to the forward dtype — bit-consistent with
            # the in-kernel window affine (h = round(relu(f32(x)*s + t)))
            g = jnp.maximum(
                g.astype(jnp.float32) * s.astype(jnp.float32)[None, :]
                + t.astype(jnp.float32)[None, :], 0
            ).astype(g.dtype)
        g = g.astype(jnp.float32)
        wsel = weights.reshape(k, c * d)[kk].astype(jnp.float32).reshape(cap, c, d)
        contrib = jnp.einsum("fc,fcd->fd", g, wsel)
        live = (idx < k * m)[:, None]
        return acc.at[mm].add(jnp.where(live, contrib, 0.0))

    out_f = _far_rounds(flat, cap, out_f, one_round)
    return out_f[:m].astype(out.dtype)


def subm_conv_fwd(
    feats: jax.Array,  # [M, C]
    nbr: jax.Array,  # [K, M] int32, M = miss
    weights: jax.Array,  # [K, C, D]
    tile: int = 256,
    window: int = 2048,
    interpret: bool = False,
    affine=None,  # optional (s, t) [C]: computes conv(relu(feats*s + t))
) -> jax.Array:
    """Windowed-DMA submanifold conv forward (exact; see module docstring).

    With ``affine``, the pre-activation BN+ReLU is applied to the window
    tiles inside the kernel (reference epilogue semantics: ``ResidualBlock``
    BN→ReLU→conv, ``modules/model/sparse_unet3d.py:103-172``) — the
    normalized activation is never materialized in HBM."""
    k, m = nbr.shape
    c = feats.shape[1]
    p = max(1, 128 // c)
    gs = _group_offsets(k)
    pos, ok = derive_pos(nbr, feats.shape[0])
    mp = -(-feats.shape[0] // p) * p  # packing follows the gather SOURCE
    lo, far = _plan_windows(pos, ok, tile, window, p, mp, group_size=gs)
    nrows = _active_rows(ok)
    fuse = affine is not None
    if fuse:
        # f32 always: the kernels apply the affine in f32 (mask consistency)
        st = _pack_affine(affine[0], affine[1], p, c, jnp.float32)
    else:
        st = jnp.zeros((2, -(-(p * c) // 128) * 128), jnp.float32)
    use_v3 = _FWD_V3 and p > 1 and p * c == 128
    # p=1 fold only pays when the per-group precompute (window rows through
    # the MXU) is shorter than the gs per-offset dots it removes
    use_v3p1 = _FWD_V3 and _FWD_V3P1 and p == 1 and window <= gs * tile
    if use_v3 or use_v3p1:
        rows = -(-(p * c) // 128) * 128
        wcat = _fold_weights(weights, p, gs, feats.dtype, rows=rows)
        out = _fwd_call_v3(feats, pos, ok & ~far, wcat, weights.shape[2], lo,
                           nrows, st, tile, window, gs, fuse, interpret)
    else:
        out = _fwd_call(feats, pos, ok & ~far, weights.astype(feats.dtype), lo,
                        nrows, st, tile, window, gs, fuse, interpret)
    return _far_correction_fwd(out, feats, nbr, weights.astype(feats.dtype), far,
                               affine=affine)


# ---------------------------------------------------------------- backward
def _bwd_kernel(c, gs, fuse, nrows_ref, lo_ref, pos_ref, ok_ref, gp_hbm, wt_ref, x_ref, st_ref,
                dx_ref, dw_ref, dst_ref, acc_ref, win_ref, sem):
    """Shared-gather backward: one window gather of the upstream grad per
    offset serves BOTH dx (gk @ W^T[flip k]) and dW[flip k] (x_tile^T @ gk).
    ``wt_ref`` is the pre-flipped, pre-transposed weight stack [K, D, C]
    (row k = W[K-1-k]^T) and ``dw_ref`` accumulates in the same flipped
    order; the XLA wrapper un-flips.  Per-offset matmuls (see _fwd_kernel:
    merging across offsets measured slower).

    With ``fuse`` the forward was conv(relu(x*s + t)): dW uses the
    recomputed h = relu(x*s+t) tile, dx is folded in place (dh·1[pre>0]·s),
    and ``dst_ref`` accumulates (ds, dt) = (Σ dh·1[pre>0]·x, Σ dh·1[pre>0])
    — no BN/ReLU VJP passes over HBM at all."""
    t = pl.program_id(0)
    k_total = pos_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[1]
    d = wt_ref.shape[1]
    p = max(1, 128 // d)  # gp packing follows grad channels D
    n_groups = k_total // gs

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dst_ref[:] = jnp.zeros_like(dst_ref)

    def dma(g):
        lo = lo_ref[g, t]
        lo_p = pl.multiple_of(lo // p, 16)
        return pltpu.make_async_copy(
            gp_hbm.at[pl.ds(lo_p, wp), :], win_ref.at[g], sem.at[g]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t * tile < nrows_ref[0])  # skip padding-tail tiles (see _fwd_kernel)
    def _compute():
        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()
        if fuse:
            # recompute the pre-activation in f32, matching the fused
            # forward's f32 affine exactly so the ReLU mask agrees row-wise
            # (also: Mosaic cannot emit a packed bf16 cmpf on this target —
            # "Target does not support this comparison" at 8x128x2xbf16)
            pre = x_ref[:].astype(jnp.float32) * st_ref[0:1, :] + st_ref[1:2, :]
            xf = jnp.maximum(pre, 0)  # h, feeds dW
            maskf = (pre > 0).astype(jnp.float32)
        else:
            xf = x_ref[:].astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)

        for g in range(n_groups):  # static unroll (see _fwd_kernel)
            copies[g].wait()
            for k in range(g * gs, (g + 1) * gs):
                local = pos_ref[k, :] - lo_ref[g, t]
                ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
                sel_packed = jnp.where(ok, local // p, -1)
                onehot = iota == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
                g128 = jax.lax.dot_general(
                    onehot.astype(win_ref.dtype),
                    win_ref[g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sub = jnp.where(ok, local % p, -1)
                gk = jnp.zeros((tile, d), jnp.float32)
                for j in range(p):
                    pick = (sub == j).astype(jnp.float32)
                    gk = gk + jnp.broadcast_to(pick.reshape(tile, 1), (tile, d)) * g128[:, j * d : (j + 1) * d]
                acc_ref[:] += jax.lax.dot_general(
                    gk.astype(wt_ref.dtype),
                    wt_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, C] — dh (grad w.r.t. the conv input h)
                # dW[k] += h_tile^T @ gk : [C, D]
                dw_ref[k] += jax.lax.dot_general(
                    xf, gk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )

        if fuse:
            dh_m = acc_ref[:] * maskf  # dh·1[pre>0]
            dst_ref[0, :] += jnp.sum(dh_m * x_ref[:].astype(jnp.float32), axis=0)
            dst_ref[1, :] += jnp.sum(dh_m, axis=0)
            acc_ref[:] = dh_m * st_ref[0:1, :].astype(jnp.float32)  # dx

    dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window", "gs", "fuse", "interpret"))
def _bwd_call(x, g, pos, ok, w_flipT, lo, nrows, st, tile, window, gs, fuse, interpret):
    k, m = pos.shape
    c = x.shape[1]
    d = g.shape[1]
    p = max(1, 128 // d)
    nt = m // tile
    ng = k // gs
    gp, mp = _pack(g, p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed grad in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # flipped-transposed weights
            pl.BlockSpec((tile, c), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2, C] affine
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, d), lambda t, nr, lo_ref: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda t, nr, lo_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, c), jnp.float32),
            pltpu.VMEM((ng, window // p, -(-(p * d) // 128) * 128), g.dtype),
            pltpu.SemaphoreType.DMA((ng,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, c, gs, fuse)  # noqa: c unused in kernel body
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((k, c, d), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        interpret=interpret,
    )(nrows, lo, pos, ok.astype(jnp.int32), gp, w_flipT, x, st)


def _fold_weights_bwd(w_flipT: jax.Array, p: int, gs: int, rows: int, dtype) -> jax.Array:
    """``w_flipT [K, D, C]`` (pre-flipped/transposed) → ``[G, rows, gs*seg]``
    for the v4 backward: offset k's block-diagonal expansion ``[p*D, p*C]``
    (p copies along the diagonal, matching the grad window's p-row lane
    packing) in its own ``seg = roundup(p*C, 128)`` lane segment, rows
    zero-padded to the window's padded lane count."""
    k, d, c = w_flipT.shape
    ng = k // gs
    eye = jnp.eye(p, dtype=w_flipT.dtype)
    wbd = jnp.einsum("ab,kdc->kadbc", eye, w_flipT).reshape(k, p * d, p * c)
    seg = -(-(p * c) // 128) * 128
    wbd = jnp.pad(wbd, ((0, 0), (0, rows - p * d), (0, seg - p * c)))
    wcat = wbd.reshape(ng, gs, rows, seg).transpose(0, 2, 1, 3).reshape(ng, rows, gs * seg)
    return wcat.astype(dtype)


def _bwd_kernel_v4(c, d, gs, fuse, nrows_ref, lo_ref, pos_ref, ok_ref, gp_hbm,
                   wcat_ref, x_ref, st_ref, dx_ref, dw_ref, dst_ref,
                   acc_ref, win_ref, cat_ref, sem):
    """v4 backward: per group, build ``cat = [window | window @ wcat]`` once
    (one VMEM copy + one wp-row dot), then each offset's single one-hot dot
    against ``cat`` yields BOTH the gathered grad (lanes [:L], unpacked for
    dW) and the weight-folded dx candidates (its wcat segment) — one
    tile-height dot per offset instead of two (the kernel is matmul-issue
    bound, so the extra output lanes are near-free).  dW and the fused
    affine/ReLU epilogue are unchanged from :func:`_bwd_kernel`."""
    t = pl.program_id(0)
    k_total = pos_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[1]
    L = win_ref.shape[2]  # padded grad lanes (roundup(p*d, 128))
    p = max(1, 128 // d)
    seg = wcat_ref.shape[2] // gs
    n_groups = k_total // gs

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dst_ref[:] = jnp.zeros_like(dst_ref)

    def dma(g):
        lo = lo_ref[g, t]
        lo_p = pl.multiple_of(lo // p, 16)
        return pltpu.make_async_copy(
            gp_hbm.at[pl.ds(lo_p, wp), :], win_ref.at[g], sem.at[g]
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t * tile < nrows_ref[0])  # skip padding-tail tiles (see _fwd_kernel)
    def _compute():
        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()
        if fuse:
            # f32 affine recompute — mask must match the fused forward's
            pre = x_ref[:].astype(jnp.float32) * st_ref[0:1, :] + st_ref[1:2, :]
            xf = jnp.maximum(pre, 0)  # h, feeds dW
            maskf = (pre > 0).astype(jnp.float32)
        else:
            xf = x_ref[:].astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (tile, p * c), 1) // c

        for g in range(n_groups):  # static unroll (see _fwd_kernel)
            copies[g].wait()
            win_g = win_ref[g]
            cat_ref[:, :L] = win_g
            wv = jax.lax.dot_general(
                win_g, wcat_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [wp, gs*seg]
            cat_ref[:, L:] = wv.astype(cat_ref.dtype)
            for k in range(g * gs, (g + 1) * gs):
                local = pos_ref[k, :] - lo_ref[g, t]
                ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
                sel_packed = jnp.where(ok, local // p, -1)
                onehot = iota == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
                big = jax.lax.dot_general(
                    onehot.astype(cat_ref.dtype),
                    cat_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, L + gs*seg]: gathered grad | folded dx candidates
                sub = jnp.where(ok, local % p, -1)
                gk = jnp.zeros((tile, d), jnp.float32)
                for j in range(p):
                    pick = (sub == j).astype(jnp.float32)
                    gk = gk + jnp.broadcast_to(pick.reshape(tile, 1), (tile, d)) * big[:, j * d : (j + 1) * d]
                # dW[k] += h_tile^T @ gk : [C, D]
                dw_ref[k] += jax.lax.dot_general(
                    xf, gk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                kl = k - g * gs
                y = big[:, L + kl * seg : L + kl * seg + p * c]
                mask = (lane_j == jnp.broadcast_to(sub.reshape(tile, 1), (tile, p * c))).astype(jnp.float32)
                y4 = y * mask
                contrib = y4[:, 0:c]
                for j in range(1, p):
                    contrib = contrib + y4[:, j * c : (j + 1) * c]
                acc_ref[:] += contrib  # dh (grad w.r.t. the conv input h)

        if fuse:
            dh_m = acc_ref[:] * maskf  # dh·1[pre>0]
            dst_ref[0, :] += jnp.sum(dh_m * x_ref[:].astype(jnp.float32), axis=0)
            dst_ref[1, :] += jnp.sum(dh_m, axis=0)
            acc_ref[:] = dh_m * st_ref[0:1, :].astype(jnp.float32)  # dx

    dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window", "gs", "fuse", "interpret"))
def _bwd_call_v4(x, g, pos, ok, wcat, lo, nrows, st, tile, window, gs, fuse, interpret):
    k, m = pos.shape
    c = x.shape[1]
    d = g.shape[1]
    p = max(1, 128 // d)
    nt = m // tile
    ng = k // gs
    gp, mp = _pack(g, p)
    L = -(-(p * d) // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed grad in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # folded flipped-T weights
            pl.BlockSpec((tile, c), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2, C] affine
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, d), lambda t, nr, lo_ref: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda t, nr, lo_ref: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, c), jnp.float32),
            pltpu.VMEM((ng, window // p, L), g.dtype),
            pltpu.VMEM((window // p, L + wcat.shape[2]), g.dtype),
            pltpu.SemaphoreType.DMA((ng,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel_v4, c, d, gs, fuse)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((k, c, d), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        interpret=interpret,
    )(nrows, lo, pos, ok.astype(jnp.int32), gp, wcat, x, st)


def _dw_kernel(gs, nrows_ref, lo_ref, pos_ref, ok_ref, src_hbm, x_ref, dw_ref, win_ref, sem):
    """dW[k] = Σ_tiles x_tile^T @ gather(src, nbr[k])_tile — the weight-grad
    half of the fused backward, standalone for the k2s2 down-table convs
    (their dx comes from a cheaper gather formulation)."""
    t = pl.program_id(0)
    k_total = pos_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[1]
    cs = dw_ref.shape[2]  # gather-source channels
    p = max(1, 128 // cs)
    n_groups = k_total // gs

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def dma(g):
        lo = lo_ref[g, t]
        lo_p = pl.multiple_of(lo // p, 16)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(lo_p, wp), :], win_ref.at[g], sem.at[g]
        )

    @pl.when(t * tile < nrows_ref[0])  # skip padding-tail tiles (see _fwd_kernel)
    def _compute():
        copies = [dma(g) for g in range(n_groups)]
        for cp in copies:
            cp.start()
        xf = x_ref[:].astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)

        for g in range(n_groups):  # static unroll (see _fwd_kernel)
            copies[g].wait()
            for k in range(g * gs, (g + 1) * gs):
                local = pos_ref[k, :] - lo_ref[g, t]
                ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
                sel_packed = jnp.where(ok, local // p, -1)
                onehot = iota == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
                g128 = jax.lax.dot_general(
                    onehot.astype(win_ref.dtype),
                    win_ref[g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sub = jnp.where(ok, local % p, -1)
                gk = jnp.zeros((tile, cs), jnp.float32)
                for j in range(p):
                    pick = (sub == j).astype(jnp.float32)
                    gk = gk + jnp.broadcast_to(pick.reshape(tile, 1), (tile, cs)) * g128[:, j * cs : (j + 1) * cs]
                dw_ref[k] += jax.lax.dot_general(
                    xf, gk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )


@functools.partial(jax.jit, static_argnames=("tile", "window", "gs", "interpret"))
def _dw_call(src, x, pos, ok, lo, nrows, tile, window, gs, interpret):
    k, m = pos.shape
    ct = x.shape[1]  # tile-side channels
    cs = src.shape[1]  # gather-source channels
    p = max(1, 128 // cs)
    nt = m // tile
    ng = k // gs
    sp, _ = _pack(src, p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, nr, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed gather source
            pl.BlockSpec((tile, ct), lambda t, nr, lo_ref: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k, ct, cs), lambda t, nr, lo_ref: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ng, window // p, -(-(p * cs) // 128) * 128), src.dtype),
            pltpu.SemaphoreType.DMA((ng,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, ct, cs), jnp.float32),
        interpret=interpret,
    )(nrows, lo, pos, ok.astype(jnp.int32), sp, x)


def table_weight_grad(
    gather_src: jax.Array,  # [Ms, Cs]
    tile_side: jax.Array,  # [M, Ct] (per-output-row factor, e.g. the grad)
    nbr: jax.Array,  # [K, M] int32, Ms = miss
    tile: int = 256,
    window: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``dW[k] = tile_side^T @ gather(gather_src, nbr[k])`` → [K, Ct, Cs],
    windowed + exact (far rows corrected in XLA)."""
    k, m = nbr.shape
    cs = gather_src.shape[1]
    p = max(1, 128 // cs)
    gs = _group_offsets(k)
    pos, ok = derive_pos(nbr, gather_src.shape[0])
    mp = -(-gather_src.shape[0] // p) * p
    lo, far = _plan_windows(pos, ok, tile, window, p, mp, group_size=gs)
    dw = _dw_call(gather_src, tile_side, pos, ok & ~far, lo, _active_rows(ok),
                  tile, window, gs, interpret)

    cap = max(4096, m // 32)
    flat = far.reshape(-1)
    x_pad = jnp.concatenate(
        [tile_side, jnp.zeros((1, tile_side.shape[1]), tile_side.dtype)]
    )

    def one_round(idx, acc):
        live = idx < k * m
        kk = jnp.minimum(idx // m, k - 1)
        mm = jnp.where(live, idx % m, m)
        src = jnp.where(live, nbr[kk, jnp.minimum(mm, m - 1)], gather_src.shape[0] - 1)
        g_far = jnp.where(live[:, None], gather_src[src].astype(jnp.float32), 0.0)
        x_far = x_pad[mm].astype(jnp.float32)
        return acc + jax.ops.segment_sum(
            jnp.einsum("ft,fs->fts", x_far, g_far), kk, num_segments=k
        )

    return _far_rounds(flat, cap, dw, one_round)


def subm_conv_bwd(
    feats: jax.Array,  # [M, C] saved forward input
    g: jax.Array,  # [M, D] upstream grad (D == C)
    nbr: jax.Array,  # [K, M]
    weights: jax.Array,  # [K, C, D]
    tile: int = 256,
    window: int = 2048,
    interpret: bool = False,
    affine=None,  # optional (s, t) [C] matching the fused forward
):
    """(dx, dW) via the shared-gather symmetry (see sparse_conv._subm_bwd):
    with g'_k = gather(g, nbr[k]),  dx = Σ_k g'_k @ W[K-1-k]^T  and
    dW[K-1-k] = x^T @ g'_k.  With ``affine`` the forward was
    conv(relu(x*s+t)); returns ``(dx, dW, ds, dt)`` with the BN/ReLU VJP
    folded into the kernel (see _bwd_kernel)."""
    k, m = nbr.shape
    d = g.shape[1]
    p = max(1, 128 // d)
    gs = _group_offsets(k)
    pos, ok = derive_pos(nbr, m)
    mp = -(-m // p) * p
    lo, far = _plan_windows(pos, ok, tile, window, p, mp, group_size=gs)
    w_flipT = jnp.flip(weights, axis=0).transpose(0, 2, 1).astype(g.dtype)  # [K, D, C]
    fuse = affine is not None
    if fuse:
        st = jnp.stack([affine[0], affine[1]]).astype(jnp.float32)  # [2, C]
    else:
        st = jnp.zeros((2, feats.shape[1]), jnp.float32)
    if _BWD_V4:
        L = -(-(p * d) // 128) * 128
        wcat = _fold_weights_bwd(w_flipT, p, gs, L, g.dtype)
        dx, dw_flip, dst = _bwd_call_v4(feats, g, pos, ok & ~far, wcat, lo,
                                        _active_rows(ok), st, tile, window, gs,
                                        fuse, interpret)
    else:
        dx, dw_flip, dst = _bwd_call(feats, g, pos, ok & ~far, w_flipT, lo, _active_rows(ok),
                                     st, tile, window, gs, fuse, interpret)

    # far corrections (rare rows): dx via gather+matmul, dW via outer products
    cap = max(4096, m // 32)
    flat = far.reshape(-1)
    wT = jnp.flip(weights, axis=0).transpose(0, 2, 1).astype(jnp.float32)
    x_pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    dx_f = jnp.concatenate(
        [dx.astype(jnp.float32), jnp.zeros((1, dx.shape[1]), jnp.float32)]
    )

    def one_round(idx, carry):
        dx_acc, dw_acc, dst_acc = carry
        live = idx < k * m
        kk = jnp.minimum(idx // m, k - 1)
        mm = jnp.where(live, idx % m, m)
        src = jnp.where(live, nbr[kk, jnp.minimum(mm, m - 1)], g.shape[0] - 1)
        gk_far = jnp.where(live[:, None], g[src].astype(jnp.float32), 0.0)  # [cap, D]
        contrib = jnp.einsum("fd,fdc->fc", gk_far, wT[kk])  # dh at rows mm
        x_raw = x_pad[jnp.minimum(mm, m)]
        if fuse:
            # fold the far dh through the same f32 relu/affine as the kernel
            pre = x_raw.astype(jnp.float32) * st[0][None, :] + st[1][None, :]
            maskf = (pre > 0).astype(jnp.float32)
            h_far = jnp.maximum(pre, 0)
            dh_m = contrib * maskf
            dx_acc = dx_acc.at[mm].add(dh_m * st[0].astype(jnp.float32)[None, :])
            live_f = live[:, None].astype(jnp.float32)
            dst_acc = dst_acc.at[0].add(
                jnp.sum(dh_m * x_raw.astype(jnp.float32) * live_f, axis=0))
            dst_acc = dst_acc.at[1].add(jnp.sum(dh_m * live_f, axis=0))
            x_far = jnp.where(live[:, None], h_far, 0.0)
        else:
            dx_acc = dx_acc.at[mm].add(contrib)
            x_far = jnp.where(live[:, None], x_raw.astype(jnp.float32), 0.0)
        dw_acc = dw_acc + jax.ops.segment_sum(
            jnp.einsum("fc,fd->fcd", x_far, gk_far), kk, num_segments=k
        )
        return dx_acc, dw_acc, dst_acc

    dx_f, dw_flip, dst = _far_rounds(flat, cap, (dx_f, dw_flip, dst), one_round)
    dx = dx_f[:m].astype(dx.dtype)
    dw = jnp.flip(dw_flip, axis=0)  # un-flip: dw[K-1-k] accumulated at row k
    if fuse:
        return dx, dw.astype(weights.dtype), dst[0], dst[1]
    return dx, dw.astype(weights.dtype)
