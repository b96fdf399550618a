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

Forward-only for now (the backward runs the XLA gather path via
``jax.custom_vjp``); used when ``use_pallas=True`` on ``SubMConv``.
"""
from __future__ import annotations

import functools
from typing import Tuple

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


def max_window_span(pos: jax.Array, tile: int) -> jax.Array:
    """Worst-case input-row span of any (offset, tile) pair."""
    k, m = pos.shape
    nt = m // tile
    p = pos[:, : nt * tile].reshape(k, nt, tile)
    return jnp.max(p[:, :, -1] - p[:, :, 0]) + 1


def _kernel(lo_ref, pos_ref, ok_ref, x_hbm, w_ref, out_ref, acc_ref, win_ref, sem):
    t = pl.program_id(0)
    k_total = w_ref.shape[0]
    tile = pos_ref.shape[1]
    w_win = win_ref.shape[0]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(k, _):
        lo = lo_ref[k, t]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(lo, w_win), :],
            win_ref,
            sem,
        )
        dma.start()
        dma.wait()
        local = pos_ref[k, :] - lo  # [T]
        ok = (ok_ref[k, :] > 0) & (local >= 0) & (local < w_win)
        safe = jnp.where(ok, local, 0)
        # one-hot gather on the MXU: [T, W] @ [W, C]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, w_win), 1) == safe[:, None]
        ) & ok[:, None]
        g = jax.lax.dot_general(
            onehot.astype(win_ref.dtype),
            win_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            g.astype(w_ref.dtype),
            w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return ()

    jax.lax.fori_loop(0, k_total, body, ())
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window", "interpret"))
def subm_conv_pallas(
    feats: jax.Array,  # [M+1, C] (null row appended by caller)
    pos: jax.Array,  # [K, M] int32 monotone
    found: jax.Array,  # [K, M] bool
    weights: jax.Array,  # [K, C, D]
    tile: int = 256,
    window: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    k, m = pos.shape
    c, d = weights.shape[1], weights.shape[2]
    assert m % tile == 0, (m, tile)
    nt = m // tile

    # per-(offset, tile) window starts, clipped so the window stays in-bounds
    lo = pos[:, :: tile]  # [K, nt]
    lo = jnp.minimum(lo, feats.shape[0] - window).astype(jnp.int32)
    lo = jnp.maximum(lo, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lo
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t, lo_ref: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights fully resident
        ],
        out_specs=pl.BlockSpec((tile, d), lambda t, lo_ref: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((window, c), feats.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # pos windows must account for the clipped lo: recompute local inside the
    # kernel from the SAME lo we prefetch, so clipping stays consistent.
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), feats.dtype),
        interpret=interpret,
    )(lo, pos, found.astype(jnp.int32), feats, weights)
