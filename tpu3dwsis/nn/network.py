"""The full 3D-WSIS network: sparse U-Net → point head → superpoint pooling →
ECC-GRU → superpoint heads → edge-attention affinity + discriminative
embedding.

TPU-native re-design of ``modules/model/backbone_3D_WSIS.py:26-255``.  The
forward is a single traced computation over a padded :class:`SceneBatch`:
voxelization, rulebook construction, all convs, graph message passing and
the edge softmax are fixed-shape XLA/Pallas ops.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.containers import BatchStatics, SceneBatch
from ..ops import rulebook, voxelize
from ..ops.rulebook import UNetPlan
from ..ops.segment import segment_mean, segment_softmax, segment_sum
from .norm import MaskedBatchNorm
from .unet import SparseUNet

__all__ = ["Preprocessed", "preprocess", "MLPHead", "WSISNet", "NetConfig", "SpatialCtx"]


class SpatialCtx(NamedTuple):
    """Spatial-sharding execution context (``parallel/spatial.py``): the
    mesh axis the voxel/point rows are sharded over, plus one halo-refresh
    callable per U-Net level.  With this set, ``WSISNet.__call__`` runs
    inside ``shard_map``: superpoint pooling psums partial sums over the
    axis (superpoints straddle slab boundaries) and the ECC/heads stage runs
    replicated on every device."""

    axis: str
    refreshes: tuple  # per-level halo refresh callables


class NetConfig(NamedTuple):
    """Model hyperparameters (``config/ScanNet_v2_3D_WSIS.yaml:36-45``)."""

    classes: int = 20
    input_channel: int = 3
    use_coords: bool = True
    media: int = 32
    blocks: int = 5
    block_reps: int = 2
    sp_feat_dim: int = 64
    ecc_iterations: int = 7
    disc_dim: int = 7
    # U-Net compute dtype: "bfloat16" halves the dominant gather/GEMM HBM
    # traffic; accumulations stay fp32 (preferred_element_type) and BN
    # statistics are always fp32. Heads/ECC run fp32 (cheap, small).
    unet_dtype: str = "float32"
    ecc_edge_dtype: str = "float32"  # edge-weight matrix compute dtype
    remat: bool = False  # jax.checkpoint each residual block (memory for FLOPs)


class Preprocessed(NamedTuple):
    """Parameter-independent per-batch structures (built once, reused by
    forward/backward): the voxel set, U-Net rulebook plan, pooled voxel
    features, and superpoint centers."""

    plan: UNetPlan
    voxel_feats: jax.Array  # [M0, C]
    p2v: jax.Array  # [N] point -> voxel row (M0 = null)
    point_feats_in: jax.Array  # [N, C] rgb (+ xyz) input features
    sp_center: jax.Array  # [S, 3] superpoint centers (segment mean of xyz)


def preprocess(batch: SceneBatch, statics: BatchStatics, use_coords: bool = True) -> Preprocessed:
    """Voxelize + build rulebooks + pool input features.

    Mirrors the host-side collate voxelization + ``pointgroup_ops
    .voxelization`` mean pooling + superpoint center scatter of the
    reference train loop (``train_scannetv2.py:149-194``), but on-device and
    jit-able.
    """
    feats = batch.point_rgb
    if use_coords:
        feats = jnp.concatenate([feats, batch.point_xyz.astype(feats.dtype)], axis=1)

    vox = voxelize.voxelize_coords(
        batch.point_coords,
        statics.spatial_shape,
        statics.max_batch,
        statics.max_voxels,
        valid=batch.point_valid,
    )
    level0 = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)
    plan = rulebook.build_unet_plan(
        level0, statics.spatial_shape, statics.max_batch,
        statics.num_levels, statics.level_sizes,
    )
    voxel_feats = voxelize.voxel_mean_pool(feats, vox.p2v, statics.max_voxels)

    s = batch.num_superpoints
    sp_center = segment_mean(batch.point_xyz, batch.point_sp, s + 1)[:s]
    return Preprocessed(plan, voxel_feats, vox.p2v, feats, sp_center)


class MLPHead(nn.Module):
    """Linear → BN → ReLU → Linear head (the shared shape of the point
    semantic head and all four superpoint heads,
    ``backbone_3D_WSIS.py:59-64,74-106``)."""

    hidden: int
    out: int
    bn_eps: float = 1e-4

    @nn.compact
    def __call__(self, x, mask, train: bool):
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = MaskedBatchNorm(self.hidden, eps=self.bn_eps, name="bn")(h, mask, train)
        h = nn.relu(h)
        return nn.Dense(self.out, name="fc2")(h)


class WSISNet(nn.Module):
    cfg: NetConfig = NetConfig()

    @nn.compact
    def __call__(
        self,
        batch: SceneBatch,
        pre: Preprocessed,
        train: bool,
        spatial: SpatialCtx | None = None,
    ) -> Dict[str, jax.Array]:
        from .ecc import EccGraphNetwork  # local import to avoid cycle at module load

        cfg = self.cfg
        ret: Dict[str, jax.Array] = {}

        # ---- backbone: sparse U-Net over voxels ----
        unet_in = pre.voxel_feats.astype(jnp.dtype(cfg.unet_dtype))
        vox_out = SparseUNet(
            cfg.media, cfg.blocks, cfg.block_reps, cfg.remat, name="unet"
        )(unet_in, pre.plan, train, spatial.refreshes if spatial is not None else None)
        vox_out = vox_out.astype(jnp.float32)
        # voxel -> point (invalid points read the appended null row)
        vox_out_null = jnp.concatenate(
            [vox_out, jnp.zeros((1, vox_out.shape[1]), vox_out.dtype)], axis=0
        )
        point_feats = vox_out_null[pre.p2v]

        # ---- point-level semantic scores ----
        ret["semantic_scores"] = MLPHead(cfg.media, cfg.classes, name="point_sem")(
            point_feats, batch.point_valid, train
        )

        # ---- superpoint pooling (scatter mean, backbone_3D_WSIS.py:188) ----
        s = batch.num_superpoints
        if spatial is None:
            embeddings = segment_mean(point_feats, batch.point_sp, s + 1)[:s]
        else:
            # points are sharded over the space axis but superpoints straddle
            # slab boundaries: psum the partial sums/counts, then every
            # device holds the full (replicated) superpoint embeddings
            from ..ops.segment import segment_count

            sums = segment_sum(point_feats, batch.point_sp, s + 1)
            cnt = segment_count(batch.point_sp, s + 1)
            sums, cnt = jax.lax.psum((sums, cnt), spatial.axis)
            embeddings = sums[:s] / jnp.maximum(cnt[:s, None], 1e-12)

        # ---- ECC graph net ----
        ecc_out = EccGraphNetwork(
            cfg.media,
            cfg.ecc_iterations,
            cfg.sp_feat_dim,
            edge_dtype=cfg.ecc_edge_dtype,
            name="ecc",
        )(
            embeddings,
            batch.edge_u,
            batch.edge_v,
            batch.edge_feats,
            batch.edge_valid,
            batch.sp_valid,
            train,
        )

        # ---- four superpoint heads ----
        d = cfg.sp_feat_dim
        ret["sp_semantic_scores"] = MLPHead(d, cfg.classes, name="sp_sem")(
            ecc_out, batch.sp_valid, train
        )
        ret["pred_sp_offset_vectors"] = MLPHead(d, 3, name="sp_offset")(
            ecc_out, batch.sp_valid, train
        )
        ret["pred_sp_occupancy"] = MLPHead(d, 1, name="sp_occupancy")(
            ecc_out, batch.sp_valid, train
        )[:, 0]
        ret["pred_sp_ins_size"] = MLPHead(d, 1, name="sp_ins_size")(
            ecc_out, batch.sp_valid, train
        )[:, 0]

        # ---- edge-attention affinity (backbone_3D_WSIS.py:108-253) ----
        q = nn.Dense(d, use_bias=False, name="w_qs")(ecc_out)
        k = nn.Dense(d, use_bias=False, name="w_ks")(ecc_out)
        v = nn.Dense(d, use_bias=False, name="w_vs")(ecc_out)

        center = pre.sp_center
        center_null = jnp.concatenate([center, jnp.zeros((1, 3), center.dtype)], axis=0)
        delta = center_null[batch.edge_u] - center_null[batch.edge_v]
        pos = nn.Dense(16, name="pos_fc1")(delta)
        pos = nn.relu(pos)
        pos = nn.Dense(1, name="pos_fc2")(pos)[:, 0]

        def null_gather(arr, idx):
            arr_n = jnp.concatenate([arr, jnp.zeros((1, arr.shape[1]), arr.dtype)], axis=0)
            return arr_n[idx]

        logits = (null_gather(q, batch.edge_u) * null_gather(k, batch.edge_v)).sum(-1)
        logits = logits / jnp.sqrt(jnp.asarray(d, logits.dtype))
        logits = logits * pos
        affinity = segment_softmax(logits, batch.edge_u, s + 1)
        ret["edge_affinity"] = affinity

        res = segment_sum(affinity[:, None] * null_gather(v, batch.edge_v), batch.edge_u, s + 1)[:s]
        sp_feat = ecc_out + res
        ret["sp_discriminative_feats"] = MLPHead(d, cfg.disc_dim, name="feature_term")(
            sp_feat, batch.sp_valid, train
        )
        ret["point_feats"] = point_feats
        return ret
