"""Pallas TPU kernel: fused gather-GEMM-accumulate submanifold convolution.

The XLA path (:mod:`tpu3dwsis.ops.sparse_conv`) scans over the K kernel
offsets, writing the fp32 accumulator [M, Cout] to HBM every step — ~2/3 of
the conv's HBM traffic. This kernel keeps the accumulator in VMEM across
all K offsets and exploits the *monotone* structure of the rulebook: for a
fixed offset, neighbor positions are non-decreasing in the output row, so a
tile of T output rows reads from a contiguous-ish window of input rows. Per
(tile, offset) we DMA one [W, C] window HBM→VMEM and gather locally with a
one-hot matmul (MXU; Mosaic has no vector VMEM gather), masking rows whose
neighbor is missing or (rare) falls outside the window.

Exactness: rows outside the window are dropped by this kernel, so the
caller checks the worst-case span (``max_window_span``) and falls back to
the XLA path when it exceeds W — spans are ~T plus slack except across
scene boundaries in a batch, which the default W absorbs.

Status (round 1): compiles and matches the XLA path bit-for-bit on real
TPU hardware, but the one-hot local gather makes it MXU-bound — measured
13.4 ms vs 8.1 ms for the XLA gather path per level-0 conv (M=131k, C=32,
window 2048). A "dynamic" mode lowering to ``tpu.dynamic_gather`` exists
and validates in interpret mode, but this Mosaic version only supports
gather offsets within the first (8,128) tile ("Input offsets outside of the
first tile"), so it cannot index a 512-row window yet. Kept as the
experimental foundation for round 2; NOT wired into the model by default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["subm_conv_pallas", "build_pos_tables", "max_window_span"]


def build_pos_tables(level, spatial_shape, max_batch, kernel_size=3):
    """(pos[K, M] monotone insertion positions, found[K, M]) for the subm
    kernel offsets — the Pallas kernel needs raw positions, not the
    miss-folded ``nbr`` table."""
    import numpy as np

    from . import hashgrid
    from .rulebook import subm_offsets

    offsets = jnp.asarray(subm_offsets(kernel_size))
    k = offsets.shape[0]
    m = level.coords.shape[0]
    q = jnp.broadcast_to(level.coords[None], (k, m, 4))
    q = q.at[:, :, 1:].add(offsets[:, None, :])
    qkeys = hashgrid.pack_coords(
        q.reshape(k * m, 4),
        spatial_shape,
        max_batch,
        valid=jnp.broadcast_to(level.valid[None, :], (k, m)).reshape(-1),
    )
    pos, found = hashgrid.lookup(level.keys, qkeys)
    pos = pos.reshape(k, m).astype(jnp.int32)
    found = found.reshape(k, m)
    # missing neighbors get the PAD insertion position (= M), breaking the
    # monotone-window property; their value is masked anyway, so repair with
    # a running max over the found positions (valid positions are themselves
    # non-decreasing, so the result is monotone).
    pos = jax.lax.cummax(jnp.where(found, pos, 0), axis=1)
    return pos, found


def max_window_span(pos: jax.Array, tile: int, channels: int = 32) -> jax.Array:
    """Worst-case input-row span of any (offset, tile) pair, including the
    window-start alignment slack (16 packed rows = ``16 * 128/channels``
    original rows)."""
    k, m = pos.shape
    nt = m // tile
    p = pos[:, : nt * tile].reshape(k, nt, tile)
    slack = 16 * (128 // channels)
    return jnp.max(p[:, :, -1] - p[:, :, 0]) + 1 + slack


def _kernel(c, gather_mode, lo_ref, pos_ref, ok_ref, xp_hbm, w_ref, out_ref, acc_ref, win_ref, sem):
    """``xp_hbm`` holds features packed ``[Mp/p, p*C=128]`` (p rows per
    lane-group) so window DMAs are fully 128-lane aligned; the packed one-hot
    matmul yields a [T, 128] row-group which is resolved to the right C-lane
    sub-slice with p static selects."""
    t = pl.program_id(0)
    k_total = w_ref.shape[0]
    tile = pos_ref.shape[1]
    wp = win_ref.shape[0]  # packed window rows
    p = 128 // c

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(k, _):
        lo = lo_ref[k, t]
        lo_p = pl.multiple_of(lo // p, 16)  # packed window start, 16-aligned
        dma = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(lo_p, wp), :],
            win_ref,
            sem,
        )
        dma.start()
        dma.wait()
        local = pos_ref[k, :] - lo  # [T]
        ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < wp * p)
        sub = jnp.where(ok, local % p, -1)
        if gather_mode == "dynamic":
            # Mosaic tpu.dynamic_gather via take_along_axis: per-lane row
            # gather on the VPU — indices must match the operand shape, so
            # pad the T selectors up to the window's row count.
            sel_packed = jnp.where(ok, local // p, 0)
            sel_pad = jnp.concatenate(
                [sel_packed, jnp.zeros((wp - tile,), jnp.int32)]
            )
            idx = jnp.broadcast_to(sel_pad.reshape(wp, 1), (wp, p * c))
            g_all = jnp.take_along_axis(
                win_ref[:], idx, axis=0, mode="promise_in_bounds"
            )
            g128 = g_all[:tile].astype(jnp.float32)
            # zero out missing rows (sel was clamped to 0 for them)
            okf = jnp.where(ok, 1.0, 0.0)
            g128 = g128 * jnp.broadcast_to(okf.reshape(tile, 1), (tile, p * c))
        else:
            sel_packed = jnp.where(ok, local // p, -1)  # -1 never matches
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
                == jnp.broadcast_to(sel_packed.reshape(tile, 1), (tile, wp))
            )
            g128 = jax.lax.dot_general(
                onehot.astype(win_ref.dtype),
                win_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, 128]
        g = jnp.zeros((tile, c), jnp.float32)
        for j in range(p):
            pick = (sub == j).astype(jnp.float32)
            g = g + jnp.broadcast_to(pick.reshape(tile, 1), (tile, c)) * g128[:, j * c : (j + 1) * c]
        acc_ref[:] += jax.lax.dot_general(
            g.astype(w_ref.dtype),
            w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return ()

    jax.lax.fori_loop(0, k_total, body, ())
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile", "window", "interpret", "gather_mode")
)
def subm_conv_pallas(
    feats: jax.Array,  # [M+1, C] (null row appended by caller)
    pos: jax.Array,  # [K, M] int32 monotone
    found: jax.Array,  # [K, M] bool
    weights: jax.Array,  # [K, C, D]
    tile: int = 256,
    window: int = 1024,
    interpret: bool = False,
    gather_mode: str = "onehot",  # "onehot" (MXU) | "dynamic" (VPU; see note)
) -> jax.Array:
    k, m = pos.shape
    c, d = weights.shape[1], weights.shape[2]
    assert m % tile == 0, (m, tile)
    assert 128 % c == 0, f"pallas path needs C | 128, got {c} (use the XLA path)"
    p = 128 // c
    nt = m // tile

    # pack p consecutive rows per 128-lane group; pad rows to a multiple of p
    mp = ((feats.shape[0] + p - 1) // p) * p
    xp = jnp.zeros((mp, c), feats.dtype).at[: feats.shape[0]].set(feats)
    xp = xp.reshape(mp // p, p * c)

    # per-(offset, tile) window starts: aligned so the PACKED start (lo/p) is
    # a multiple of the 16-sublane tile, and clipped to keep the window
    # in-bounds
    q = 16 * p
    assert window % q == 0, (window, q)
    lo = pos[:, ::tile]  # [K, nt]
    lo = (lo // q) * q
    hi = ((mp - window) // q) * q
    lo = jnp.clip(lo, 0, max(hi, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lo
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed feats stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights fully resident
        ],
        out_specs=pl.BlockSpec((tile, d), lambda t, lo_ref: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((window // p, p * c), feats.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    assert window // p >= tile, "dynamic gather needs window/p >= tile"
    kernel = functools.partial(_kernel, c, gather_mode)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), feats.dtype),
        interpret=interpret,
    )(lo, pos, found.astype(jnp.int32), xp, weights)
