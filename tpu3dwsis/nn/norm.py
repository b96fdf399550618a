"""Masked batch normalization over padded row sets.

The reference applies ``nn.BatchNorm1d(eps=1e-4, momentum=0.1)`` over the
active voxels of a sparse tensor (``modules/model/sparse_unet3d.py:107``) and
``eps=1e-5`` variants inside the graph net (``modules/model/graphnet.py:62``).
On TPU all row arrays are padded to static shapes, so batch statistics must
be computed over the *valid* rows only — plain ``flax.linen.BatchNorm``
would fold padding zeros into the statistics.

Semantics follow torch's BatchNorm1d: normalization uses biased batch
variance; running stats are updated as ``new = (1-momentum)*old +
momentum*batch`` with *unbiased* batch variance; eval mode normalizes with
running stats.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MaskedBatchNorm"]


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-4
    momentum: float = 0.1
    affine: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool, return_affine: bool = False):
        """x: ``[M, C]``; mask: ``[M]`` bool/float over valid rows.

        ``return_affine=True`` returns the equivalent per-channel fp32
        ``(s, t)`` with ``bn(x) == x*s + t`` instead of applying it — for the
        fused conv epilogue (``sparse_conv.subm_conv_bnrelu``).  Running
        stats still update in train mode."""
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            w = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(w.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w).sum(axis=0) / n
            var = (jnp.square(xf - mean[None, :]) * w).sum(axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if return_affine:
            inv = 1.0 / jnp.sqrt(var + self.eps)
            s = scale * inv if self.affine else inv
            t = (bias - mean * s) if self.affine else (-mean * inv)
            return s, t

        y = (x - mean[None, :]) / jnp.sqrt(var[None, :] + self.eps)
        if self.affine:
            y = y * scale[None, :] + bias[None, :]
        return y.astype(x.dtype)
