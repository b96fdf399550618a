"""Inference + evaluation entry point: ``python -m tpu3dwsis.infer.cli``.

The reference equivalent is ``python test_scannetv2.py --config ...``
(``test_scannetv2.py:101-276``): per-scene whole-scene forward, three-level
semantic evaluation (point / superpoint-mode / superpoint-head broadcast),
graph BFS clustering, and the ScanNet AP protocol.
"""
from __future__ import annotations

import argparse
import logging
import os
import numpy as np

from ..data.collate import to_scene_batch
from ..data.loader import SceneDataset
from ..eval.classes import (
    SCANNET_INSTANCE_CLASS_IDS,
    SCANNET_INSTANCE_CLASS_NAMES,
    SCANNET_SEMANTIC_IDS,
    SCANNET_VALID_CLASS_MASK,
)
from ..eval.instance_ap import InstanceAPEvaluator, encode_gt_instances
from ..eval.semantic import SemanticEvaluator
from ..nn.network import WSISNet
from ..train.checkpoint import load_checkpoint
from ..train.cli import build_world
from ..train.step import make_forward_fn
from ..utils.config import Config
from .clustering import cluster_scene

__all__ = ["main", "evaluate_dataset"]

log = logging.getLogger("tpu3dwsis.infer")


def evaluate_dataset(
    model: WSISNet,
    params,
    batch_stats,
    dataset: SceneDataset,
    bfs_ratio: float = 0.25,
    with_instances: bool = True,
    dataset_kind: str = "scannetv2",
    dump_dir: str | None = None,
):
    """Run the full test protocol over a dataset; returns a metrics dict.

    ``dataset_kind='s3dis'`` switches to the S3DIS protocol: BFS ratio 0.8,
    ceiling/floor/wall post-processing, and the dual instance evaluation
    (coverage metrics + ScanNet-style AP) of ``test_s3dis.py``.

    ``dump_dir`` writes per-scene prediction dumps (instance/semantic PLYs +
    npz masks) like the reference's ``evaluation/visualization`` scripts.
    """
    from .batched import batched_scene_outputs

    is_s3dis = dataset_kind == "s3dis"
    if is_s3dis:
        from ..eval.classes import S3DIS_CLASS_NAMES, S3DIS_SEMANTIC_IDS
        from ..eval.s3dis_cov import S3DISCoverageEvaluator
        from .s3dis_post import cluster_scene_s3dis

        cov_ev = S3DISCoverageEvaluator(num_classes=model.cfg.classes)
        sem_ids = S3DIS_SEMANTIC_IDS
        inst_ids = list(S3DIS_SEMANTIC_IDS)
        inst_names = S3DIS_CLASS_NAMES
        bfs_ratio = 0.8 if bfs_ratio == 0.25 else bfs_ratio
    else:
        sem_ids = SCANNET_SEMANTIC_IDS
        inst_ids = list(SCANNET_INSTANCE_CLASS_IDS)
        inst_names = SCANNET_INSTANCE_CLASS_NAMES

    forward = make_forward_fn(model, dataset.statics)
    classes = model.cfg.classes
    pt_ev = SemanticEvaluator([str(i) for i in range(classes)])
    mid_ev = SemanticEvaluator([str(i) for i in range(classes)])
    sp_ev = SemanticEvaluator([str(i) for i in range(classes)])
    ap_ev = InstanceAPEvaluator(inst_ids, inst_names)
    rng = np.random.default_rng(567)  # reference test seed (config :15)

    done = 0
    for scene, outs in batched_scene_outputs(
        forward, params, batch_stats, dataset, dataset.statics.max_batch, rng
    ):
        n, s = scene.num_points, scene.num_superpoints

        point_pred = np.asarray(outs["semantic_scores"].argmax(-1))[:n]
        pt_ev.process(point_pred, scene.sem)

        # "middle": per-superpoint mode of point predictions broadcast back
        mid_pred = np.zeros(n, np.int64)
        sp_of = scene.superpoint
        counts = np.zeros((s, classes), np.int64)
        np.add.at(counts, (sp_of, point_pred), 1)
        mode = counts.argmax(1)
        mid_pred = mode[sp_of]
        mid_ev.process(mid_pred, scene.sem)

        sp_head_pred = np.asarray(outs["sp_semantic_scores"].argmax(-1))[:s]
        sp_ev.process(sp_head_pred[sp_of], scene.sem)

        if with_instances:
            if is_s3dis:
                res = cluster_scene_s3dis(
                    scene.xyz,
                    scene.superpoint,
                    scene.edges,
                    sp_head_pred,
                    outs["pred_sp_offset_vectors"][:s],
                    outs["pred_sp_occupancy"][:s],
                    outs["pred_sp_ins_size"][:s],
                    bfs_ratio=bfs_ratio,
                )
                cov_ev.process(res.masks, res.class_indices, scene.sem, scene.ins)
            else:
                res = cluster_scene(
                    scene.xyz,
                    scene.superpoint,
                    scene.edges,
                    sp_head_pred,
                    outs["pred_sp_offset_vectors"][:s],
                    outs["pred_sp_occupancy"][:s],
                    outs["pred_sp_ins_size"][:s],
                    SCANNET_VALID_CLASS_MASK,
                    bfs_ratio=bfs_ratio,
                )
            gt_ids = encode_gt_instances(
                sem_ids[np.clip(scene.sem, 0, classes - 1)], scene.ins
            )
            ap_ev.process(
                scene.name,
                res.masks,
                sem_ids[res.class_indices],
                res.confidences,
                gt_ids,
            )
            if dump_dir is not None:
                from .visualize import dump_scene_instances

                dump_scene_instances(
                    dump_dir, scene.name, scene.xyz, res.masks,
                    res.class_indices, res.confidences, point_sem_pred=point_pred,
                )
        done += 1
        log.info("evaluated %s (%d/%d)", scene.name, done, len(dataset.scenes))

    metrics = {
        "point_miou": pt_ev.evaluate()["miou"],
        "middle_miou": mid_ev.evaluate()["miou"],
        "sp_miou": sp_ev.evaluate()["miou"],
    }
    if with_instances:
        ap = ap_ev.evaluate()
        metrics.update(
            {"mAP": ap["all_ap"], "mAP50": ap["all_ap_50"], "mAP25": ap["all_ap_25"]}
        )
        # precision/recall@0.5 table (the reference prints this on the S3DIS
        # eval path, ins_seg_evaluator.py:351-431; cheap, so report always)
        pr = ap_ev.prec_recall(0.5)
        metrics.update({"prec50": pr["precision"], "rec50": pr["recall"]})
        for label, row in pr["classes"].items():
            log.info(
                "prec/recall@0.5 %-16s prec=%.3f rec=%.3f (tp=%d fp=%d total=%d)",
                label, row["precision"], row["recall"],
                row["tp"], row["fp"], row["total"],
            )
        if is_s3dis:
            metrics.update(cov_ev.evaluate())
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description="tpu3dwsis inference/eval")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--dump-dir", default=None,
                   help="write per-scene instance/semantic PLY + npz dumps here")
    p.add_argument("opts", nargs="*")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = Config.fromfile(args.config)
    Config.merge_from_options(cfg, args.opts)

    model, statics, train_ds, val_ds, _ = build_world(cfg)
    dataset = val_ds if args.split == "val" and val_ds is not None else train_ds

    # whole-scene inference runs uncropped: refit the bucket to the eval
    # split (the training bucket assumes the max_npoint crop)
    from ..core.buckets import fit_statics

    eval_batch = int(cfg.get("eval_batch", 4))
    statics = fit_statics(
        dataset.scenes,
        batch_size=min(eval_batch, len(dataset.scenes)),
        scale=float(cfg.data.scale),
        max_npoint=10**9,
        spatial_extent="auto",
        aug_margin=(1.0, 1.0, 1.0),  # no augmentation at eval
        num_levels=int(cfg.model.blocks),
    )
    dataset.statics = statics

    # initialize shapes directly (no optimizer needed for inference)
    import jax

    from ..data.collate import to_scene_batch as _tsb
    from ..nn.network import preprocess

    rng = np.random.default_rng(0)
    arrays = dataset.collate_batch([0], rng, training=False)
    b0 = _tsb(arrays)
    pre = preprocess(b0, statics, use_coords=model.cfg.use_coords)
    variables = model.init(jax.random.PRNGKey(0), b0, pre, train=False)

    from ..train.checkpoint import load_checkpoint as _load

    payload, meta = _load(args.checkpoint)
    params, batch_stats = payload.params, payload.batch_stats
    log.info("loaded checkpoint %s (%s)", args.checkpoint, meta)

    metrics = evaluate_dataset(
        model, params, batch_stats, dataset, dataset_kind=cfg.data.dataset,
        dump_dir=args.dump_dir,
    )
    for k, v in metrics.items():
        log.info("%s: %.4f", k, v)
    print(metrics)


if __name__ == "__main__":
    main()
