"""Sparse convolution compute: gather → GEMM → accumulate/scatter.

The MXU-friendly formulation of spconv's three conv types
(``SubMConv3d`` / ``SparseConv3d(k2,s2)`` / ``SparseInverseConv3d``, call
sites ``modules/model/sparse_unet3d.py:116-119,261-267,292-297``):

* every conv is gather→GEMM over kernel offsets, where the neighbor tables
  come from :mod:`tpu3dwsis.ops.rulebook`;
* **offset grouping**: the MXU is a 128×128 systolic array, so a
  ``[M, 32] x [32, 32]`` per-offset matmul wastes ~16× of it in K/N
  padding.  We instead gather ``g = max(1, 128 // Cin)`` offsets at once
  into ``[M, g*Cin]`` and do ONE ``[M, g*Cin] x [g*Cin, Cout]`` matmul —
  the same FLOPs and HBM traffic, but the contraction dimension now fills
  the array.  Offsets short of a full group read the null row / zero
  weights, so grouping never changes the math;
* gathers use a features array with one extra **null row** of zeros at index
  ``M`` so misses contribute nothing;
* the inverse conv is a pure gather: every fine site has exactly one
  (parent, offset) pair.

The loop over offset groups is a ``lax.scan`` so peak memory stays
``O(M*C)``; XLA pipelines the gather of step k+1 with the matmul of step k.
Weights are stored ``[K, Cin, Cout]`` with offset order defined by
``rulebook.subm_offsets`` / ``rulebook.down_offsets``.

A fused Pallas kernel for the gather-GEMM inner loop lives in
:mod:`tpu3dwsis.ops.pallas_spconv`; this module is the XLA reference path and
the autodiff-complete default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gather_conv",
    "scatter_conv",
    "subm_conv",
    "subm_conv_bnrelu",
    "down_conv",
    "down_conv_bnrelu",
    "inverse_conv",
    "inverse_conv_raw",
    "inverse_conv_scatter",
]

# MXU contraction width to fill with offset groups
_MXU_K = 128


def _with_null_row(feats: jax.Array) -> jax.Array:
    """Append a zero row so index ``M`` reads zeros."""
    return jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0)


def _group_size(k: int, c: int) -> int:
    """Offsets per K-block: fill the MXU contraction dim (c*g >= 128)."""
    return max(1, min(int(k), _MXU_K // max(int(c), 1)))


def _grouped(nbr: jax.Array, weights: jax.Array, group: int, null_idx: int):
    """Reshape ``nbr [K, M]`` / ``weights [K, Cin, Cout]`` into G groups of
    ``group`` offsets, zero/null padding the tail group."""
    k, m = nbr.shape
    cin, cout = weights.shape[1], weights.shape[2]
    kp = -(-k // group) * group
    if kp != k:
        nbr = jnp.concatenate(
            [nbr, jnp.full((kp - k, m), null_idx, nbr.dtype)], axis=0
        )
        weights = jnp.concatenate(
            [weights, jnp.zeros((kp - k, cin, cout), weights.dtype)], axis=0
        )
    return nbr.reshape(kp // group, group, m), weights.reshape(kp // group, group * cin, cout)


def gather_conv(
    feats: jax.Array,
    nbr: jax.Array,
    weights: jax.Array,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """``out[m] = sum_k feats[nbr[k, m]] @ weights[k]`` with null-row misses.

    feats: ``[M_in, Cin]``; nbr: ``[K, M_out]`` int32 (``M_in`` = miss);
    weights: ``[K, Cin, Cout]``. Returns ``[M_out, Cout]`` in feats.dtype.
    """
    x = _with_null_row(feats)
    m_out = nbr.shape[1]
    cin, cout = weights.shape[1], weights.shape[2]
    group = _group_size(nbr.shape[0], cin)
    nbr_g, w_g = _grouped(nbr, weights.astype(feats.dtype), group, feats.shape[0])

    def step(acc, kw):
        nbr_k, w_k = kw  # [group, M_out], [group*Cin, Cout]
        g = x[nbr_k.T].reshape(m_out, group * cin)
        acc = acc + jnp.dot(g, w_k, preferred_element_type=accum_dtype)
        return acc, None

    acc0 = jnp.zeros((m_out, cout), accum_dtype)
    acc, _ = jax.lax.scan(step, acc0, (nbr_g, w_g))
    return acc.astype(feats.dtype)


def scatter_conv(
    feats: jax.Array,
    nbr: jax.Array,
    weights: jax.Array,
    m_out: int,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Transposed conv: ``out[nbr[k, m]] += feats[m] @ weights[k]``.

    feats: ``[M_in, Cin]``; nbr: ``[K, M_in]`` int32 with values in
    ``[0, m_out]`` (``m_out`` = dropped null slot); weights ``[K, Cin,
    Cout]``. Returns ``[m_out, Cout]``.  For the k2s2 inverse conv every
    child row receives exactly one (k, m) contribution, so this is
    collision-free; the implementation is still an add-scatter and therefore
    correct regardless (oracle path only — the model uses the gather forms).
    """
    def step(acc, kw):
        nbr_k, w_k = kw
        y = jnp.dot(feats, w_k, preferred_element_type=accum_dtype)  # [M_in, Cout]
        acc = acc.at[nbr_k].add(y, mode="drop")
        return acc, None

    acc0 = jnp.zeros((m_out + 1, weights.shape[2]), accum_dtype)
    acc, _ = jax.lax.scan(step, acc0, (nbr, weights))
    return acc[:m_out].astype(feats.dtype)


def _weight_grad(feats, nbr, g, accum_dtype=jnp.float32):
    """dW[k] = gather(x, nbr[k])^T @ g — recompute-the-gather formulation,
    offset-grouped so the matmul's M dimension is ``group*Cin`` (>=128)
    instead of a 128-padded Cin=32."""
    x = _with_null_row(feats)
    m_out = nbr.shape[1]
    cin = feats.shape[1]
    k = nbr.shape[0]
    group = _group_size(k, cin)
    kp = -(-k // group) * group
    if kp != k:
        nbr = jnp.concatenate(
            [nbr, jnp.full((kp - k, m_out), feats.shape[0], nbr.dtype)], axis=0
        )
    nbr_g = nbr.reshape(kp // group, group, m_out)

    def step(_, nbr_k):
        gk = x[nbr_k.T].reshape(m_out, group * cin)  # [M_out, group*Cin]
        dw = jnp.einsum("mc,md->cd", gk, g, preferred_element_type=accum_dtype)
        return None, dw  # [group*Cin, Cout]

    _, dws = jax.lax.scan(step, None, nbr_g)
    dws = dws.reshape(kp // group, group, cin, -1).reshape(kp, cin, -1)
    return dws[:k]  # [K, Cin, Cout]


# Custom VJPs: every backward is a GATHER, never a scatter ---------------------
#
# Submanifold symmetry: voxel m's neighbor at offset +d is j  ⟺  j's neighbor
# at offset -d is m, and for the row-major offset enumeration -d sits at the
# flipped index K-1-k.  Likewise the k2s2 down conv's transpose is exactly the
# inverse conv's (parent, child_offset) gather and vice versa.  Scatter-adds
# measured ~8x slower than gathers on TPU, so this buys most of the backward.
#
# Dispatch: on TPU, eligible convs use the Pallas windowed-DMA kernel
# (ops/pallas_spconv2.py) — XLA's row gather runs at ~12-15 ns/row here
# regardless of formulation, which made the 27-offset gather chain the whole
# step's bottleneck at real-scan scale.  C=96 packs unaligned lanes and runs
# Pallas; C=160 is excluded by default (_XLA_WIDTHS below — A/B-measured
# slightly faster on XLA at the tiny L4 tables); the input conv C=6 and CPU
# tests take the XLA path below.

import os as _os

_CONV_IMPL = _os.environ.get("TPU3DWSIS_CONV", "auto")  # auto | xla | pallas
_PALLAS_TILE = int(_os.environ.get("TPU3DWSIS_CONV_TILE", "256"))
# Window length directly scales BOTH the kernel's DMA traffic and its one-hot
# gather-matmul cost.  Measured on real bench-scene rulebooks
# (scripts/far_fraction.py): submanifold tables have ZERO far rows at 512
# (positions advance ~1 source row per output row), while down tables need
# 2048 (each coarse row's 8 children span up to ~8x the tile in fine rows).
_PALLAS_WINDOW = int(_os.environ.get("TPU3DWSIS_CONV_WINDOW", "512"))
_PALLAS_WINDOW_DOWN = int(_os.environ.get("TPU3DWSIS_CONV_WINDOW_DOWN", "2048"))
# Per-width dispatch override: comma-separated gather-channel widths that run
# the XLA path even when the kernel is eligible.  Measured (NEXT.md lever 6):
# at the tiny L4 tables the XLA fwd beats the Pallas fwd (4.1 vs 7.2 ms) while
# Pallas wins the bwd — net XLA is slightly ahead for C=160, so it is the
# default exclusion.
_XLA_WIDTHS = frozenset(
    int(x) for x in _os.environ.get("TPU3DWSIS_CONV_XLA_WIDTHS", "160").split(",") if x
)


def _pallas_ok(gather_channels, m_table: int, m_src: int,
               window: int = _PALLAS_WINDOW) -> bool:
    """Kernel eligibility: every listed gather-source channel count must be
    lane-aligned (widths dividing 128 pack ``p = 128/C`` rows per window row;
    wider ones run unpacked at ``p = 1``), the output-table rows must tile
    evenly, and the gather source must be at least one window tall."""
    if _CONV_IMPL == "xla":
        return False
    if any(c % 32 or c > 512 or c in _XLA_WIDTHS for c in gather_channels):
        return False
    if m_table % _PALLAS_TILE or m_src < window:
        return False
    if _CONV_IMPL == "pallas":
        return True
    return jax.default_backend() in ("tpu", "axon")


@jax.custom_vjp
def _subm_conv_pallas(feats, subm_nbr, weights):
    from .pallas_spconv2 import subm_conv_fwd

    return subm_conv_fwd(
        feats, subm_nbr, weights, tile=_PALLAS_TILE, window=_PALLAS_WINDOW
    )


def _subm_pallas_fwd(feats, subm_nbr, weights):
    return _subm_conv_pallas(feats, subm_nbr, weights), (feats, subm_nbr, weights)


def _subm_pallas_bwd(res, g):
    from .pallas_spconv2 import subm_conv_bwd

    feats, nbr, w = res
    dx, dw = subm_conv_bwd(
        feats, g.astype(feats.dtype), nbr, w,
        tile=_PALLAS_TILE, window=_PALLAS_WINDOW,
    )
    return dx.astype(feats.dtype), None, dw.astype(w.dtype)


_subm_conv_pallas.defvjp(_subm_pallas_fwd, _subm_pallas_bwd)


def subm_conv(feats, subm_nbr, weights):
    """Submanifold conv at one level (spconv ``SubMConv3d`` semantics).
    Dispatches to the Pallas windowed kernel on TPU when supported (forward
    gathers feats with Cin channels, backward gathers the grad with Cout)."""
    if _pallas_ok(
        (feats.shape[1], weights.shape[2]), subm_nbr.shape[1], feats.shape[0]
    ):
        return _subm_conv_pallas(feats, subm_nbr, weights)
    return subm_conv_xla(feats, subm_nbr, weights)


# Fused pre-activation epilogue: conv(relu(x*s + t)).  The reference's
# ResidualBlock runs BN→ReLU→SubMConv (modules/model/sparse_unet3d.py:103-172)
# as three HBM round-trips; the fused kernel applies the affine+ReLU on the
# window tiles it already DMAs, and its backward folds the ReLU mask, the
# affine grads (ds, dt), and the dW h-recompute in kernel — removing every
# BN/ReLU elementwise pass over [M, C].  A/B gate, default on.
_FUSE_BN = _os.environ.get("TPU3DWSIS_FUSE_BN", "1") != "0"


@jax.custom_vjp
def _subm_conv_bnrelu_pallas(feats, s, t, subm_nbr, weights):
    from .pallas_spconv2 import subm_conv_fwd

    return subm_conv_fwd(
        feats, subm_nbr, weights, tile=_PALLAS_TILE, window=_PALLAS_WINDOW,
        affine=(s, t),
    )


def _subm_bnrelu_fwd(feats, s, t, subm_nbr, weights):
    out = _subm_conv_bnrelu_pallas(feats, s, t, subm_nbr, weights)
    return out, (feats, s, t, subm_nbr, weights)


def _subm_bnrelu_bwd(res, g):
    from .pallas_spconv2 import subm_conv_bwd

    feats, s, t, nbr, w = res
    dx, dw, ds, dt = subm_conv_bwd(
        feats, g.astype(feats.dtype), nbr, w,
        tile=_PALLAS_TILE, window=_PALLAS_WINDOW, affine=(s, t),
    )
    return (dx.astype(feats.dtype), ds.astype(s.dtype), dt.astype(t.dtype),
            None, dw.astype(w.dtype))


_subm_conv_bnrelu_pallas.defvjp(_subm_bnrelu_fwd, _subm_bnrelu_bwd)


def subm_conv_bnrelu(feats, s, t, subm_nbr, weights):
    """``subm_conv(relu(feats * s + t), ...)`` with the affine+ReLU fused
    into the conv kernel on TPU; unfused fallback elsewhere.  ``s``/``t`` are
    the per-channel BN affine (fp32), differentiable."""
    if _FUSE_BN and _pallas_ok(
        (feats.shape[1], weights.shape[2]), subm_nbr.shape[1], feats.shape[0]
    ):
        return _subm_conv_bnrelu_pallas(feats, s, t, subm_nbr, weights)
    # f32 affine rounded to the conv dtype — same semantics as the fused
    # kernel (a bf16 pre-activation flips the ReLU mask near zero)
    h = jax.nn.relu(
        feats.astype(jnp.float32) * s.astype(jnp.float32)[None, :]
        + t.astype(jnp.float32)[None, :]
    ).astype(feats.dtype)
    return subm_conv(h, subm_nbr, weights)


@jax.custom_vjp
def subm_conv_xla(feats, subm_nbr, weights):
    """XLA gather-GEMM submanifold conv (reference path / fallback)."""
    return gather_conv(feats, subm_nbr, weights)


def _subm_fwd(feats, subm_nbr, weights):
    return gather_conv(feats, subm_nbr, weights), (feats, subm_nbr, weights)


def _subm_bwd(res, g):
    feats, nbr, w = res
    g = g.astype(feats.dtype)
    # Shared-gather backward: with g'_k = gather(g, nbr[k]),
    #   dL/dx     = sum_k g'_k @ W[K-1-k]^T        (offset-flip symmetry)
    #   dL/dW[K-1-k] = x^T @ g'_k                   (same bijective matching)
    # so ONE gather per offset serves both gradients; gathers and matmuls are
    # offset-grouped like the forward.
    g_null = _with_null_row(g)
    m = feats.shape[0]
    cin, cout = w.shape[1], w.shape[2]
    k = nbr.shape[0]
    w_back = jnp.flip(w, axis=0).transpose(0, 2, 1).astype(feats.dtype)  # [K, Cout, Cin]
    group = _group_size(k, cout)
    nbr_g, wb_g = _grouped(nbr, w_back, group, m)
    kp = nbr_g.shape[0] * group
    xf = feats.astype(jnp.float32)

    def step(acc, kw):
        nbr_k, wb_k = kw  # [group, M], [group*Cout, Cin]
        gk = g_null[nbr_k.T].reshape(m, group * cout)
        acc = acc + jnp.dot(gk, wb_k, preferred_element_type=jnp.float32)
        dw_k = jnp.einsum("mc,md->cd", xf, gk, preferred_element_type=jnp.float32)
        return acc, dw_k  # dw_k: [Cin, group*Cout]

    acc0 = jnp.zeros((m, cin), jnp.float32)
    dx, dw_blocks = jax.lax.scan(step, acc0, (nbr_g, wb_g))
    dw_flipped = (
        dw_blocks.reshape(kp // group, cin, group, cout)
        .transpose(0, 2, 1, 3)
        .reshape(kp, cin, cout)[:k]
    )
    dw = jnp.flip(dw_flipped, axis=0).astype(w.dtype)
    return dx.astype(feats.dtype), None, dw


subm_conv_xla.defvjp(_subm_fwd, _subm_bwd)


@jax.custom_vjp
def _down_conv_pallas(feats, down_nbr, parent, child_offset, weights):
    """Windowed-kernel down conv: ``down_nbr[k]`` is monotone per offset
    (coarse keys ascending ⇒ their ``2c+o`` children ascend in fine key
    order), so the same kernel applies with K=8."""
    from .pallas_spconv2 import subm_conv_fwd

    return subm_conv_fwd(
        feats, down_nbr, weights, tile=_PALLAS_TILE, window=_PALLAS_WINDOW_DOWN
    )


def _down_pallas_fwd(feats, down_nbr, parent, child_offset, weights):
    out = _down_conv_pallas(feats, down_nbr, parent, child_offset, weights)
    return out, (feats, down_nbr, parent, child_offset, weights)


def _down_pallas_bwd(res, g):
    from .pallas_spconv2 import table_weight_grad

    feats, down_nbr, parent, child_offset, w = res
    g = g.astype(feats.dtype)
    dx = inverse_conv_raw(g, parent, child_offset, w.transpose(0, 2, 1))
    # dW[k] = gather(x, down_nbr[k])^T @ g  — windowed over the fine source
    dw = table_weight_grad(
        feats, g, down_nbr, tile=_PALLAS_TILE, window=_PALLAS_WINDOW_DOWN
    ).transpose(0, 2, 1)
    return dx, None, None, None, dw.astype(w.dtype)


_down_conv_pallas.defvjp(_down_pallas_fwd, _down_pallas_bwd)


@jax.custom_vjp
def _down_conv_bnrelu_pallas(feats, s, t, down_nbr, parent, child_offset, weights):
    from .pallas_spconv2 import subm_conv_fwd

    return subm_conv_fwd(
        feats, down_nbr, weights, tile=_PALLAS_TILE,
        window=_PALLAS_WINDOW_DOWN, affine=(s, t),
    )


def _down_bnrelu_fwd(feats, s, t, down_nbr, parent, child_offset, weights):
    out = _down_conv_bnrelu_pallas(feats, s, t, down_nbr, parent, child_offset, weights)
    return out, (feats, s, t, down_nbr, parent, child_offset, weights)


def _down_bnrelu_bwd(res, g):
    from .pallas_spconv2 import table_weight_grad

    feats, s, t, down_nbr, parent, child_offset, w = res
    g = g.astype(feats.dtype)
    # dL/dh at fine rows (h = relu(x*s + t)): the transpose of the down conv
    # is exactly the inverse-conv gather.
    dh = inverse_conv_raw(g, parent, child_offset, w.transpose(0, 2, 1))
    sf = s.astype(jnp.float32)[None, :]
    pre = feats.astype(jnp.float32) * sf + t.astype(jnp.float32)[None, :]
    # f32 affine invariant (see NEXT.md): the mask must match the kernel's
    dpre = jnp.where(pre > 0, dh.astype(jnp.float32), 0.0)
    dx = (dpre * sf).astype(feats.dtype)
    ds = jnp.sum(dpre * feats.astype(jnp.float32), axis=0).astype(s.dtype)
    dt = jnp.sum(dpre, axis=0).astype(t.dtype)
    # dW needs the post-activation h the forward never materialized —
    # recompute it once (same rounding as the in-kernel affine).
    h = jnp.maximum(pre, 0.0).astype(feats.dtype)
    dw = table_weight_grad(
        h, g, down_nbr, tile=_PALLAS_TILE, window=_PALLAS_WINDOW_DOWN
    ).transpose(0, 2, 1)
    return dx, ds, dt, None, None, None, dw.astype(w.dtype)


_down_conv_bnrelu_pallas.defvjp(_down_bnrelu_fwd, _down_bnrelu_bwd)


def down_conv_bnrelu(feats, s, t, down_nbr, parent, child_offset, weights):
    """``down_conv(relu(feats * s + t), ...)`` with the pre-activation BN
    affine + ReLU fused into the conv kernel's window loads on TPU (the
    reference's down path is BN→ReLU→SparseConv3d,
    ``modules/model/sparse_unet3d.py:261-267``); unfused fallback elsewhere."""
    if _FUSE_BN and _pallas_ok(
        (feats.shape[1],), down_nbr.shape[1], feats.shape[0],
        window=_PALLAS_WINDOW_DOWN,
    ):
        return _down_conv_bnrelu_pallas(
            feats, s, t, down_nbr, parent, child_offset, weights
        )
    h = jax.nn.relu(
        feats.astype(jnp.float32) * s.astype(jnp.float32)[None, :]
        + t.astype(jnp.float32)[None, :]
    ).astype(feats.dtype)
    return down_conv(h, down_nbr, parent, child_offset, weights)


def down_conv(feats, down_nbr, parent, child_offset, weights):
    """k=2 s=2 strided conv fine→coarse (spconv ``SparseConv3d`` semantics);
    Pallas windowed path on TPU (both its gathers read ``feats``, so only
    Cin must pack into 128 lanes)."""
    if _pallas_ok((feats.shape[1],), down_nbr.shape[1], feats.shape[0],
                  window=_PALLAS_WINDOW_DOWN):
        return _down_conv_pallas(feats, down_nbr, parent, child_offset, weights)
    return down_conv_xla(feats, down_nbr, parent, child_offset, weights)


@jax.custom_vjp
def down_conv_xla(feats, down_nbr, parent, child_offset, weights):
    """XLA gather-GEMM down conv (reference path / fallback)."""
    return gather_conv(feats, down_nbr, weights)


def _down_fwd(feats, down_nbr, parent, child_offset, weights):
    return gather_conv(feats, down_nbr, weights), (feats, down_nbr, parent, child_offset, weights)


def _down_bwd(res, g):
    feats, down_nbr, parent, child_offset, w = res
    g = g.astype(feats.dtype)
    # each fine voxel feeds exactly one (k, coarse) pair -> inverse-conv gather
    dx = inverse_conv_raw(g, parent, child_offset, w.transpose(0, 2, 1))
    dw = _weight_grad(feats, down_nbr, g).astype(w.dtype)
    return dx, None, None, None, dw


down_conv_xla.defvjp(_down_fwd, _down_bwd)


def inverse_conv_raw(feats, parent, child_offset, weights, accum_dtype=jnp.float32):
    """k=2 inverse conv coarse→fine restoring the pre-downsample active set
    (spconv ``SparseInverseConv3d`` sharing the down conv's indice_key).

    Gather formulation: every fine site has exactly one (parent, offset)
    pair, so ``out[i] = feats[parent[i]] @ weights[child_offset[i]]``.
    Computed as 8 coarse-side matmuls then ONE row gather from the stacked
    results — gathers are ~8× cheaper than the scatter-adds of the
    transposed formulation on TPU (see ``scatter_conv``, kept as the
    reference path).

    feats: ``[M_coarse, Cin]``; parent: ``[M_fine]`` int32 with ``M_coarse``
    = miss; child_offset: ``[M_fine]`` int32 in [0, K). Returns
    ``[M_fine, Cout]``.
    """
    m_c = feats.shape[0]
    k = weights.shape[0]
    y = jnp.einsum(
        "mc,kcd->kmd", feats, weights.astype(feats.dtype), preferred_element_type=accum_dtype
    ).astype(feats.dtype)
    flat = y.reshape(k * m_c, -1)
    flat = jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), flat.dtype)], axis=0)
    idx = jnp.where(parent >= m_c, k * m_c, child_offset * m_c + parent)
    return flat[idx]


@jax.custom_vjp
def _inverse_conv_pallas(feats, parent, child_offset, down_nbr, weights):
    # forward stays the cheap single-gather formulation; the Pallas win is
    # in the backward's two down-table gathers of the (fine) grad
    return inverse_conv_raw(feats, parent, child_offset, weights)


def _inv_pallas_fwd(feats, parent, child_offset, down_nbr, weights):
    out = _inverse_conv_pallas(feats, parent, child_offset, down_nbr, weights)
    return out, (feats, parent, child_offset, down_nbr, weights)


def _inv_pallas_bwd(res, g):
    from .pallas_spconv2 import subm_conv_fwd, table_weight_grad

    feats, parent, child_offset, down_nbr, w = res
    g = g.astype(feats.dtype)
    dx = subm_conv_fwd(
        g, down_nbr, w.transpose(0, 2, 1), tile=_PALLAS_TILE,
        window=_PALLAS_WINDOW_DOWN
    )
    dw = table_weight_grad(
        g, feats, down_nbr, tile=_PALLAS_TILE, window=_PALLAS_WINDOW_DOWN
    )
    return dx, None, None, None, dw.astype(w.dtype)


_inverse_conv_pallas.defvjp(_inv_pallas_fwd, _inv_pallas_bwd)


def _affine_pre(feats, s, t):
    """f32 pre-activation ``x*s + t`` — the shared rounding invariant: the
    ReLU mask in forward and backward must come from the SAME f32 affine
    (a bf16 affine flips the mask near zero, see NEXT.md)."""
    return (
        feats.astype(jnp.float32) * s.astype(jnp.float32)[None, :]
        + t.astype(jnp.float32)[None, :]
    )


@jax.custom_vjp
def _inverse_conv_bnrelu(feats, s, t, parent, child_offset, down_nbr, weights):
    # forward keeps the cheap single-gather formulation over the (small)
    # coarse side; the fusion win is the backward: ReLU mask + affine grads
    # folded into the Pallas down-table gathers, no h residual saved
    h = jnp.maximum(_affine_pre(feats, s, t), 0.0).astype(feats.dtype)
    return inverse_conv_raw(h, parent, child_offset, weights)


def _inv_bnrelu_fwd(feats, s, t, parent, child_offset, down_nbr, weights):
    out = _inverse_conv_bnrelu(feats, s, t, parent, child_offset, down_nbr, weights)
    return out, (feats, s, t, parent, child_offset, down_nbr, weights)


def _inv_bnrelu_bwd(res, g):
    from .pallas_spconv2 import subm_conv_fwd, table_weight_grad

    feats, s, t, parent, child_offset, down_nbr, w = res
    g = g.astype(feats.dtype)
    # dh at coarse rows: the transpose of the inverse conv is the down conv
    # (pad coarse rows only see miss entries ⇒ dh = 0 there, so the affine
    # grads below take no pollution from padding)
    dh = subm_conv_fwd(
        g, down_nbr, w.transpose(0, 2, 1), tile=_PALLAS_TILE,
        window=_PALLAS_WINDOW_DOWN,
    )
    pre = _affine_pre(feats, s, t)
    dpre = jnp.where(pre > 0, dh.astype(jnp.float32), 0.0)
    sf = s.astype(jnp.float32)[None, :]
    dx = (dpre * sf).astype(feats.dtype)
    ds = jnp.sum(dpre * feats.astype(jnp.float32), axis=0).astype(s.dtype)
    dt = jnp.sum(dpre, axis=0).astype(t.dtype)
    # dW[k] = h^T @ gather(g, down_nbr[k]) — recompute h once (same rounding
    # as the forward's f32 affine)
    h = jnp.maximum(pre, 0.0).astype(feats.dtype)
    dw = table_weight_grad(
        g, h, down_nbr, tile=_PALLAS_TILE, window=_PALLAS_WINDOW_DOWN
    )
    return dx, ds, dt, None, None, None, dw.astype(w.dtype)


_inverse_conv_bnrelu.defvjp(_inv_bnrelu_fwd, _inv_bnrelu_bwd)


def inverse_conv_bnrelu(feats, s, t, parent, child_offset, down_nbr, weights):
    """``inverse_conv(relu(feats * s + t), ...)`` with the pre-activation BN
    affine + ReLU folded into the conv's custom VJP on TPU (the reference's
    up path is BN→ReLU→SparseInverseConv3d,
    ``modules/model/sparse_unet3d.py:269-274``); unfused fallback elsewhere."""
    if _FUSE_BN and _pallas_ok(
        (weights.shape[2],), down_nbr.shape[1], parent.shape[0],
        window=_PALLAS_WINDOW_DOWN,
    ):
        return _inverse_conv_bnrelu(
            feats, s, t, parent, child_offset, down_nbr, weights
        )
    h = jnp.maximum(_affine_pre(feats, s, t), 0.0).astype(feats.dtype)
    return inverse_conv(h, parent, child_offset, down_nbr, weights)


def inverse_conv(feats, parent, child_offset, down_nbr, weights):
    """k=2 inverse conv coarse→fine; Pallas-backward path on TPU (its
    gathers read the fine grad with Cout channels)."""
    if _pallas_ok((weights.shape[2],), down_nbr.shape[1], parent.shape[0],
                  window=_PALLAS_WINDOW_DOWN):
        return _inverse_conv_pallas(feats, parent, child_offset, down_nbr, weights)
    return inverse_conv_xla(feats, parent, child_offset, down_nbr, weights)


@jax.custom_vjp
def inverse_conv_xla(feats, parent, child_offset, down_nbr, weights):
    """Differentiable inverse conv; ``down_nbr`` drives the gather-only
    backward (the transpose of this op IS the down conv)."""
    return inverse_conv_raw(feats, parent, child_offset, weights)


def _inv_fwd(feats, parent, child_offset, down_nbr, weights):
    return inverse_conv_raw(feats, parent, child_offset, weights), (
        feats, parent, child_offset, down_nbr, weights,
    )


def _inv_bwd(res, g):
    feats, parent, child_offset, down_nbr, w = res
    g = g.astype(feats.dtype)
    dx = gather_conv(g, down_nbr, w.transpose(0, 2, 1))
    # dW[k] = x^T @ gather(g, down_nbr[k]) — grouped like _weight_grad but
    # with the gather on the OUTPUT side
    g_null = _with_null_row(g)
    m_c = feats.shape[0]
    cin, cout = w.shape[1], w.shape[2]
    k = down_nbr.shape[0]
    group = _group_size(k, cout)
    kp = -(-k // group) * group
    nbr = down_nbr
    if kp != k:
        nbr = jnp.concatenate(
            [nbr, jnp.full((kp - k, m_c), g.shape[0], nbr.dtype)], axis=0
        )
    nbr_g = nbr.reshape(kp // group, group, m_c)
    xf = feats.astype(jnp.float32)

    def step(_, nbr_k):
        gk = g_null[nbr_k.T].reshape(m_c, group * cout)
        dw = jnp.einsum("mc,md->cd", xf, gk, preferred_element_type=jnp.float32)
        return None, dw  # [Cin, group*Cout]

    _, dw_blocks = jax.lax.scan(step, None, nbr_g)
    dws = (
        dw_blocks.reshape(kp // group, cin, group, cout)
        .transpose(0, 2, 1, 3)
        .reshape(kp, cin, cout)[:k]
    )
    return dx, None, None, None, dws.astype(w.dtype)


inverse_conv_xla.defvjp(_inv_fwd, _inv_bwd)


def inverse_conv_scatter(feats, down_nbr, weights, m_out: int):
    """Transposed-scatter formulation of the inverse conv (oracle path)."""
    return scatter_conv(feats, down_nbr, weights, m_out)
