"""Sparse 3D U-Net on rulebook tables (flax).

TPU-first re-design of the reference backbone
(``modules/model/sparse_unet3d.py``): pre-activation residual blocks of
submanifold 3³ convs, k2s2 strided downsampling, inverse-conv upsampling with
skip concatenation, recursively over ``len(nPlanes)`` levels
(``UBlock``, ``sparse_unet3d.py:213-350``; ``ResidualBlock``,
``:103-172``).  Instead of spconv's lazily built GPU-hash rulebooks, every
level consumes precomputed neighbor tables from a
:class:`tpu3dwsis.ops.rulebook.UNetPlan`, so the whole U-Net is one static
traced computation of large gather→GEMM→accumulate steps on the MXU.

Channel widths follow the reference: ``[media * (i+1) for i in
range(blocks)]`` (``modules/model/backbone_3D_WSIS.py:49-50``), default
``media=32, blocks=5, block_reps=2``.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import sparse_conv
from ..ops.rulebook import UNetPlan
from .norm import MaskedBatchNorm

__all__ = ["SubMConv", "FusedSubMConv", "DownConv", "FusedDownConv", "InverseConv", "FusedInverseConv", "ResidualBlock", "UBlock", "SparseUNet"]


def _conv_init(k: int, cin: int):
    # fan-in = K * Cin, matching dense-conv variance scaling.
    return nn.initializers.variance_scaling(1.0, "fan_in", "normal", in_axis=(0, 1), out_axis=2)


class SubMConv(nn.Module):
    """Submanifold conv (bias-free), weights ``[K, Cin, Cout]`` where K is
    the number of kernel offsets in the supplied neighbor table (27 for 3³,
    9 for the factorized (1,3,3)/(3,1,3) kernels)."""

    features: int

    @nn.compact
    def __call__(self, x, subm_nbr):
        k = subm_nbr.shape[0]
        w = self.param("kernel", _conv_init(k, x.shape[-1]), (k, x.shape[-1], self.features))
        return sparse_conv.subm_conv(x, subm_nbr, w.astype(x.dtype))


class FusedSubMConv(nn.Module):
    """``SubMConv(relu(x*s + t))`` with the BN affine + ReLU fused into the
    conv kernel's window loads (param tree identical to :class:`SubMConv`,
    so checkpoints are interchangeable)."""

    features: int

    @nn.compact
    def __call__(self, x, s, t, subm_nbr):
        k = subm_nbr.shape[0]
        w = self.param("kernel", _conv_init(k, x.shape[-1]), (k, x.shape[-1], self.features))
        return sparse_conv.subm_conv_bnrelu(x, s, t, subm_nbr, w.astype(x.dtype))


class DownConv(nn.Module):
    """k=2 s=2 strided conv fine→coarse, weights ``[8, Cin, Cout]``.
    The inverse tables (parent/child_offset) feed the gather-only backward."""

    features: int

    @nn.compact
    def __call__(self, x, down_nbr, parent, child_offset):
        w = self.param("kernel", _conv_init(8, x.shape[-1]), (8, x.shape[-1], self.features))
        return sparse_conv.down_conv(x, down_nbr, parent, child_offset, w.astype(x.dtype))


class FusedDownConv(nn.Module):
    """``DownConv(relu(x*s + t))`` with the BN affine + ReLU fused into the
    conv kernel's window loads (param tree identical to :class:`DownConv`,
    so checkpoints are interchangeable)."""

    features: int

    @nn.compact
    def __call__(self, x, s, t, down_nbr, parent, child_offset):
        w = self.param("kernel", _conv_init(8, x.shape[-1]), (8, x.shape[-1], self.features))
        return sparse_conv.down_conv_bnrelu(
            x, s, t, down_nbr, parent, child_offset, w.astype(x.dtype)
        )


class InverseConv(nn.Module):
    """k=2 inverse conv coarse→fine (restores pre-downsample sites).
    ``down_nbr`` feeds the gather-only backward."""

    features: int

    @nn.compact
    def __call__(self, x, parent, child_offset, down_nbr):
        w = self.param("kernel", _conv_init(8, x.shape[-1]), (8, x.shape[-1], self.features))
        return sparse_conv.inverse_conv(x, parent, child_offset, down_nbr, w.astype(x.dtype))


class FusedInverseConv(nn.Module):
    """``InverseConv(relu(x*s + t))`` with the BN affine + ReLU folded into
    the conv's custom VJP (param tree identical to :class:`InverseConv`,
    so checkpoints are interchangeable)."""

    features: int

    @nn.compact
    def __call__(self, x, s, t, parent, child_offset, down_nbr):
        w = self.param("kernel", _conv_init(8, x.shape[-1]), (8, x.shape[-1], self.features))
        return sparse_conv.inverse_conv_bnrelu(
            x, s, t, parent, child_offset, down_nbr, w.astype(x.dtype)
        )


def _axis_zero_rows(axis: int):
    """Row indices of the 27-offset table whose offset along ``axis`` is 0 —
    the (1,3,3)/(3,1,3) factorized kernels are subsets of the 3³ kernel, so
    the asymmetric blocks reuse slices of the shared level table."""
    import numpy as _np

    from ..ops.rulebook import subm_offsets as _so

    return _np.where(_so(3)[:, axis] == 0)[0]


def _id(x):
    """Default no-op halo refresh.  The spatially-sharded forward passes a
    per-level ``refresh`` that overwrites halo voxel rows with their owners'
    freshly-convolved values (lax.ppermute over the space axis); it must run
    after every conv output and nowhere else — elementwise ops (BN eval,
    ReLU, residual adds) keep halo copies consistent on their own."""
    return x


class VGGBlock(nn.Module):
    """BN→ReLU→SubM3 (``sparse_unet3d.py:175-211``, ``normalize_before``),
    fused into the conv kernel's window loads."""

    features: int

    @nn.compact
    def __call__(self, x, subm_nbr, mask, train: bool, refresh=_id):
        s, t = MaskedBatchNorm(x.shape[-1], name="bn")(x, mask, train, return_affine=True)
        return refresh(FusedSubMConv(self.features, name="conv")(x, s, t, subm_nbr))


class AsymResidualBlock(nn.Module):
    """Two-branch factorized residual block (``sparse_unet3d.py:40-100``):
    branch 1 = 3×1×3 then 1×3×3 convs, branch 2 the reverse, summed.
    Kernel tables are the axis-zero slices of the level's 3³ table."""

    features: int

    @nn.compact
    def __call__(self, x, subm_nbr, mask, train: bool, refresh=_id):
        rows_133 = _axis_zero_rows(0)  # (1,3,3): dx == 0
        rows_313 = _axis_zero_rows(1)  # (3,1,3): dy == 0
        nbr_133 = subm_nbr[rows_133]
        nbr_313 = subm_nbr[rows_313]

        def branch(first_nbr, second_nbr, name):
            h = MaskedBatchNorm(x.shape[-1], name=f"{name}_bn1")(x, mask, train)
            h = nn.leaky_relu(h)
            h = refresh(SubMConv(self.features, name=f"{name}_conv1")(h, first_nbr))
            h = MaskedBatchNorm(self.features, name=f"{name}_bn2")(h, mask, train)
            h = nn.leaky_relu(h)
            return refresh(SubMConv(self.features, name=f"{name}_conv2")(h, second_nbr))

        return branch(nbr_313, nbr_133, "b1") + branch(nbr_133, nbr_313, "b2")


class ResidualBlock(nn.Module):
    """Pre-activation residual block: BN→ReLU→SubM3→BN→ReLU→SubM3 plus an
    identity (or 1×1 linear) shortcut (``sparse_unet3d.py:103-172``)."""

    features: int
    bn_eps: float = 1e-4
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, subm_nbr, mask, train: bool, refresh=_id):
        cin = x.shape[-1]
        if cin == self.features:
            identity = x
        else:
            # spconv SubMConv3d(kernel_size=1, bias=False) == pointwise linear
            identity = nn.Dense(
                self.features, use_bias=False, dtype=x.dtype, name="i_branch"
            )(x)
        s1, t1 = MaskedBatchNorm(cin, eps=self.bn_eps, momentum=self.bn_momentum, name="bn1")(
            x, mask, train, return_affine=True
        )
        h = refresh(FusedSubMConv(self.features, name="conv1")(x, s1, t1, subm_nbr))
        s2, t2 = MaskedBatchNorm(self.features, eps=self.bn_eps, momentum=self.bn_momentum, name="bn2")(
            h, mask, train, return_affine=True
        )
        h = refresh(FusedSubMConv(self.features, name="conv2")(h, s2, t2, subm_nbr))
        return h + identity


class UBlock(nn.Module):
    """Recursive U-Net block over ``nPlanes`` (``sparse_unet3d.py:213-350``).

    ``remat`` wraps each residual block in ``jax.checkpoint`` so backward
    re-runs the gather/GEMMs instead of keeping every [M, C] activation
    live — the TPU answer to the reference's per-iteration
    ``torch.cuda.empty_cache()`` memory pressure (``train_scannetv2.py:144``).
    """

    nPlanes: Sequence[int]
    block_reps: int = 2
    depth: int = 0  # index into plan.levels
    remat: bool = False
    block: str = "residual"  # residual | vgg | asym (sparse_unet3d.py:229-237)

    @nn.compact
    def __call__(self, x, plan: UNetPlan, train: bool, refreshes=None):
        lp = plan.levels[self.depth]
        mask = lp.level.valid
        planes = self.nPlanes[0]
        base = {"residual": ResidualBlock, "vgg": VGGBlock, "asym": AsymResidualBlock}[self.block]
        Block = nn.remat(base, static_argnums=(4, 5)) if self.remat else base
        rf = refreshes[self.depth] if refreshes is not None else _id

        for i in range(self.block_reps):
            x = Block(planes, name=f"block{i}")(x, lp.subm_nbr, mask, train, rf)

        if len(self.nPlanes) > 1:
            nxt = plan.levels[self.depth + 1]
            nxt_mask = nxt.level.valid
            rf_next = refreshes[self.depth + 1] if refreshes is not None else _id
            identity = x
            # down: BN→ReLU→SparseConv3d(k2,s2), fused into the conv kernel
            sd, td = MaskedBatchNorm(planes, name="down_bn")(
                x, mask, train, return_affine=True
            )
            h = rf_next(FusedDownConv(self.nPlanes[1], name="down_conv")(
                x, sd, td, lp.down_nbr, lp.parent, lp.child_offset
            ))
            h = UBlock(
                self.nPlanes[1:], self.block_reps, self.depth + 1, self.remat,
                self.block, name="u"
            )(h, plan, train, refreshes)
            # up: BN→ReLU→SparseInverseConv3d sharing the down table, the
            # affine + ReLU folded into the conv's custom VJP
            su, tu = MaskedBatchNorm(self.nPlanes[1], name="up_bn")(
                h, nxt_mask, train, return_affine=True
            )
            h = rf(FusedInverseConv(planes, name="up_conv")(
                h, su, tu, lp.parent, lp.child_offset, lp.down_nbr
            ))
            x = jnp.concatenate([identity, h], axis=-1)
            for i in range(self.block_reps):
                x = Block(planes, name=f"tail{i}")(x, lp.subm_nbr, mask, train, rf)
        return x


class SparseUNet(nn.Module):
    """Input SubM conv + recursive UBlock + output BN/ReLU
    (``backbone_3D_WSIS.py:42-55``). Returns ``[M0, media]`` voxel features."""

    media: int = 32
    blocks: int = 5
    block_reps: int = 2
    remat: bool = False
    block: str = "residual"

    @nn.compact
    def __call__(self, voxel_feats, plan: UNetPlan, train: bool, refreshes=None):
        planes = [self.media * (i + 1) for i in range(self.blocks)]
        assert len(plan.levels) == self.blocks, (
            f"UNetPlan has {len(plan.levels)} levels but model expects {self.blocks}"
        )
        if refreshes is not None:
            assert not self.remat, "halo refresh closures cannot cross a remat boundary"
        rf0 = refreshes[0] if refreshes is not None else _id
        lp0 = plan.levels[0]
        x = rf0(SubMConv(self.media, name="input_conv")(voxel_feats, lp0.subm_nbr))
        x = UBlock(planes, self.block_reps, 0, self.remat, self.block, name="unet")(
            x, plan, train, refreshes
        )
        x = MaskedBatchNorm(self.media, name="output_bn")(x, lp0.level.valid, train)
        return nn.relu(x)
