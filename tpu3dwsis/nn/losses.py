"""Multi-task loss: point/superpoint semantics (CE + dice), offset norm/dir,
per-scene discriminative (pull/push/reg), occupancy and instance-size L1.

Masked fixed-shape re-design of ``modules/model/losses_3D_WSIS.py:13-253``.
Boolean-indexing filters become mask weights; the per-scene python loop of
the discriminative loss becomes segment ops over a ``[B, I_max]`` instance
grid (scene-local instance ids with a fixed stride), so the whole loss jits.

Stage gating matches the reference: superpoint losses only when ``epoch >
joint_training_epoch`` (passed here as the static flag
``superpoint_losses``); offset supervision and occupancy/size supervision
are additional static flags flipped by the curriculum driver
(``train_scannetv2.py:771-783``).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.containers import SceneBatch
from ..ops.segment import segment_count, segment_mean, segment_sum

__all__ = ["LossConfig", "LossFlags", "multi_task_loss", "dice_loss_multi_classes", "discriminative_loss"]

IGNORE = -100


class LossConfig(NamedTuple):
    classes: int = 20
    semantic_dice: bool = True
    disc_dim: int = 7
    delta_v: float = 0.1  # OccuSeg pull margin (losses_3D_WSIS.py:28)
    delta_d: float = 1.5  # OccuSeg push margin (losses_3D_WSIS.py:29)
    param_var: float = 1.0
    param_dist: float = 1.0
    param_reg: float = 0.001
    max_instances: int = 128  # I_max: per-scene instance capacity
    num_scenes: int = 4  # B


class LossFlags(NamedTuple):
    """Static curriculum gates (jit cache keys)."""

    superpoint_losses: bool = False  # epoch > joint_training_epoch
    supervise_sp_offset: bool = False  # stage >= 2
    supervise_instance_size: bool = False  # stage 3


def _masked_ce(scores, labels, mask):
    """CrossEntropyLoss(ignore_index=-100) over masked rows (mean)."""
    mask = mask & (labels != IGNORE)
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    w = mask.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def dice_loss_multi_classes(probs, one_hot, mask, epsilon=1e-5):
    """Per-class dice over masked rows (``losses_3D_WSIS.py:233-253``)."""
    w = mask.astype(jnp.float32)[:, None]
    p = probs.astype(jnp.float32) * w
    t = one_hot.astype(jnp.float32) * w
    inter = (p * t).sum(axis=0)
    denom = jnp.square(p).sum(axis=0) + jnp.square(t).sum(axis=0) + 1e-4 + epsilon
    return 1.0 - (2.0 * inter + epsilon) / denom


def discriminative_loss(
    feats: jax.Array,
    sp_scene: jax.Array,
    sp_ins_local: jax.Array,
    valid: jax.Array,
    cfg: LossConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """OccuSeg-style pull/push/reg on superpoint embeddings, per scene
    (``losses_3D_WSIS.py:157-230``); returns scene-means of
    (total, l_var, l_dist, l_reg)."""
    b, imax = cfg.num_scenes, cfg.max_instances
    n_inst = b * imax
    ok = valid & (sp_ins_local >= 0) & (sp_ins_local < imax) & (sp_scene >= 0) & (sp_scene < b)
    seg = jnp.where(ok, sp_scene * imax + sp_ins_local, n_inst)

    f = feats.astype(jnp.float32)
    counts = segment_count(seg, n_inst + 1)[:n_inst]  # [B*I]
    inst_valid = counts > 0
    mu = segment_mean(f, seg, n_inst + 1)[:n_inst]  # [B*I, D]

    # ---- pull (l_var) ----
    mu_null = jnp.concatenate([mu, jnp.zeros((1, f.shape[1]), jnp.float32)], axis=0)
    # safe norm: sqrt has an infinite gradient at 0, and f == mu exactly for
    # single-superpoint instances — guard the radicand.
    d = jnp.sqrt(jnp.sum(jnp.square(f - mu_null[seg]), axis=1) + 1e-12)
    hinge = jnp.square(jnp.maximum(d - cfg.delta_v, 0.0))
    per_inst = segment_sum(hinge * ok, seg, n_inst + 1)[:n_inst] / jnp.maximum(counts, 1.0)
    per_inst = per_inst.reshape(b, imax)
    iv = inst_valid.reshape(b, imax).astype(jnp.float32)
    n_per_scene = iv.sum(axis=1)  # [B]
    l_var = (per_inst * iv).sum(axis=1) / jnp.maximum(n_per_scene, 1.0)

    # ---- push (l_dist): pairwise within scene ----
    mu_b = mu.reshape(b, imax, -1)
    cd = jnp.abs(mu_b[:, :, None, :] - mu_b[:, None, :, :]).sum(-1)  # L1 cdist [B, I, I]
    margin = jnp.square(jnp.maximum(2.0 * cfg.delta_d - cd, 0.0))
    pair_ok = iv[:, :, None] * iv[:, None, :]
    eye = jnp.eye(imax)[None]
    pair_ok = pair_ok * (1.0 - eye)
    denom = jnp.maximum(n_per_scene * (n_per_scene - 1.0), 1.0)
    l_dist = (margin * pair_ok).sum(axis=(1, 2)) / denom
    l_dist = jnp.where(n_per_scene > 1, l_dist, 0.0)

    # ---- reg ----
    l_reg = (jnp.sqrt(jnp.sum(jnp.square(mu_b), axis=-1) + 1e-12) * iv).sum(axis=1)

    l_var = cfg.param_var * l_var
    l_dist = cfg.param_dist * l_dist
    l_reg = cfg.param_reg * l_reg
    total = l_var + l_dist + l_reg
    return total.mean(), l_var.mean(), l_dist.mean(), l_reg.mean()


def multi_task_loss(
    outputs: Dict[str, jax.Array],
    batch: SceneBatch,
    cfg: LossConfig,
    flags: LossFlags,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    out: Dict[str, jax.Array] = {}

    # ---- point semantic CE (+ dice) ----
    sem_scores = outputs["semantic_scores"]
    pmask = batch.point_valid
    semantic_loss = _masked_ce(sem_scores, batch.point_sem, pmask)
    if cfg.semantic_dice:
        dmask = pmask & (batch.point_sem != IGNORE)
        probs = jax.nn.softmax(sem_scores.astype(jnp.float32), axis=-1)
        one_hot = jax.nn.one_hot(jnp.where(dmask, batch.point_sem, 0), cfg.classes)
        semantic_loss = semantic_loss + dice_loss_multi_classes(probs, one_hot, dmask).mean()
    out["semantic_loss"] = semantic_loss
    loss = semantic_loss

    if flags.superpoint_losses:
        sp_valid = (
            batch.sp_valid & (batch.sp_ins != IGNORE) & (batch.sp_sem != IGNORE)
        )

        # ---- superpoint semantic CE ----
        sp_sem_loss = _masked_ce(outputs["sp_semantic_scores"], batch.sp_sem, batch.sp_valid)
        out["superpoint_semantic_loss"] = sp_sem_loss
        loss = loss + sp_sem_loss

        # ---- offset norm + direction (losses_3D_WSIS.py:79-95) ----
        if flags.supervise_sp_offset:
            pred = outputs["pred_sp_offset_vectors"].astype(jnp.float32)
            gt = batch.sp_offset.astype(jnp.float32)
            w = sp_valid.astype(jnp.float32)
            denom = w.sum() + 1e-6
            norm_loss = (jnp.abs(pred - gt).sum(-1) * w).sum() / denom
            def safe_norm(x):  # sqrt grad guard at 0
                return jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-16)

            gt_dir = gt / (safe_norm(gt) + 1e-8)
            pr_dir = pred / (safe_norm(pred) + 1e-8)
            dir_loss = (-(gt_dir * pr_dir).sum(-1) * w).sum() / denom
            out["offset_norm_loss"] = norm_loss
            out["offset_dir_loss"] = dir_loss
            loss = loss + norm_loss + dir_loss

        # ---- discriminative ----
        d_loss, l_var, l_dist, l_reg = discriminative_loss(
            outputs["sp_discriminative_feats"],
            batch.sp_scene,
            batch.sp_ins_local,
            sp_valid,
            cfg,
        )
        out["superpoint_discriminative_loss"] = d_loss
        loss = loss + d_loss

        # ---- occupancy / instance size L1 (losses_3D_WSIS.py:117-127) ----
        if flags.supervise_instance_size:
            w = sp_valid.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            occ = (jnp.abs(outputs["pred_sp_occupancy"] - batch.sp_occupancy) * w).sum() / denom
            size = (jnp.abs(outputs["pred_sp_ins_size"] - batch.sp_size) * w).sum() / denom
            out["occupancy_loss"] = occ
            out["instance_size_loss"] = size
            loss = loss + occ + size

    out["loss"] = loss
    return loss, out
