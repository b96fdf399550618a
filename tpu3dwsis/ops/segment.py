"""Segment reductions over padded index arrays.

TPU-native replacement for the reference's ``torch_scatter.scatter(...,
reduce='mean'/'max'/'sum')`` calls (superpoint pooling at
``modules/model/backbone_3D_WSIS.py:188``, superpoint centers at
``train_scannetv2.py:177``, edge-softmax max/sum at
``backbone_3D_WSIS.py:225,232``) and the NVRTC segment-mean kernels in
``modules/model/ecc/cuda_kernels.py:50-134``.

All functions take a *static* ``num_segments`` so shapes stay fixed under
``jit``.  Padded elements are routed to a dedicated null segment (by
convention the last segment id, ``num_segments - 1``) by the callers; these
ops themselves are agnostic — they simply drop indices outside
``[0, num_segments)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_count",
    "segment_argmax",
    "segment_softmax",
]


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum of ``data`` rows per segment. Shape ``[num_segments, *data.shape[1:]]``."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids: jax.Array, num_segments: int, weights=None) -> jax.Array:
    """Number of elements (or total weight) per segment, ``float32 [num_segments]``."""
    if weights is None:
        weights = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    weights=None,
) -> jax.Array:
    """Mean of ``data`` rows per segment (0 for empty segments)."""
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (data.ndim - weights.ndim))
        total = segment_sum(data * w, segment_ids, num_segments)
    else:
        total = segment_sum(data, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments, weights)
    count = count.reshape(count.shape + (1,) * (data.ndim - 1))
    return total / jnp.maximum(count, 1e-12)


def segment_max(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, initial=None
) -> jax.Array:
    """Max of ``data`` rows per segment. Empty segments get ``initial``
    (default: the dtype's most negative value)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    if initial is not None:
        count = segment_count(segment_ids, num_segments)
        count = count.reshape(count.shape + (1,) * (data.ndim - 1))
        out = jnp.where(count > 0, out, initial)
    return out


def segment_min(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, initial=None
) -> jax.Array:
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    if initial is not None:
        count = segment_count(segment_ids, num_segments)
        count = count.reshape(count.shape + (1,) * (data.ndim - 1))
        out = jnp.where(count > 0, out, initial)
    return out


def segment_argmax(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Index (into ``data``) of the max element of each segment.

    Empty segments return ``data.shape[0]`` (an out-of-range sentinel).
    Only supports 1-D ``data``.
    """
    assert data.ndim == 1
    n = data.shape[0]
    seg_max = segment_max(data, segment_ids, num_segments)
    is_max = data == seg_max[segment_ids]
    idx = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_max, idx, n)
    out = jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)
    return jnp.minimum(out, n)  # empty segments (int32-max fill) -> sentinel n


def segment_softmax(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically-stable softmax within each segment over a 1-D logits array.

    Mirrors the scatter-max / scatter-sum stabilized edge softmax of the
    reference affinity head (``modules/model/backbone_3D_WSIS.py:224-236``).
    """
    seg_max = segment_max(logits, segment_ids, num_segments, initial=jnp.zeros((), logits.dtype))
    shifted = logits - seg_max[segment_ids]
    e = jnp.exp(shifted)
    denom = segment_sum(e, segment_ids, num_segments)
    return e / jnp.maximum(denom[segment_ids], 1e-12)
