"""Training entry point: ``python -m tpu3dwsis.train.cli --config ...``.

The reference equivalent is ``python train_scannetv2.py --config
config/ScanNet_v2_3D_WSIS.yaml`` (``README.md:47-55``); supports the same
dotted CLI overrides and resume.
"""
from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from ..core.containers import BatchStatics
from ..data.loader import SceneDataset
from ..data.scene import Scene
from ..data.weak_labels import WeakLabelStore
from ..nn.network import NetConfig, WSISNet
from ..utils.config import Config
from ..utils.logging import collect_logger
from .checkpoint import latest_checkpoint, load_checkpoint
from .curriculum import CurriculumConfig, Trainer

__all__ = ["main", "build_world"]


def _load_scenes(cfg, split: str) -> List[Scene]:
    ds = cfg.data.dataset
    if ds == "synthetic":
        from ..data.synthetic import make_scene

        n = int(cfg.data.get("num_scenes", 4))
        base = 0 if split == "train" else 1000
        return [
            make_scene(seed=base + i, num_instances=4, points_per_instance=120, num_background=400)
            for i in range(n)
        ]
    from .. import data as _data
    from ..data.scannet import load_split

    root = cfg.data.data_root
    if ds == "s3dis":
        from ..data.s3dis import load_area_split

        return load_area_split(root, split, test_area=int(cfg.data.get("test_area", 5)))
    return load_split(os.path.join(root, split))


def statics_from_cfg(cfg, scenes=None, batch_size=None) -> BatchStatics:
    """Bucket capacities from config, or measured from the dataset when the
    config says ``buckets: auto``."""
    if batch_size is None:
        batch_size = int(cfg.curriculum.batch_size)
    if cfg.get("buckets") in (None, "auto"):
        from ..core.buckets import fit_statics

        assert scenes, "buckets: auto needs scenes to measure"
        return fit_statics(
            scenes,
            batch_size,
            scale=float(cfg.data.scale),
            max_npoint=int(cfg.data.max_npoint),
            spatial_extent=int(cfg.data.full_scale[1]),
            num_levels=int(cfg.model.blocks),
        )
    b = cfg.buckets
    return BatchStatics(
        spatial_shape=tuple(b.spatial_shape),
        max_batch=int(b.max_batch),
        max_voxels=int(b.max_voxels),
        num_levels=int(b.num_levels),
        level_sizes=tuple(b.level_sizes),
        max_points=int(b.max_points),
        max_superpoints=int(b.max_superpoints),
        max_edges=int(b.max_edges),
        max_instances=int(b.max_instances),
    )


def build_world(cfg, logger=None, distributed: bool = False):
    """Construct (model, statics, train_dataset, val_dataset, trainer_cfg).

    ``distributed``: multi-host mode (``jax.distributed`` already
    initialized).  Capacities are fitted on the FULL scene list with the
    per-host batch size (identical statics on every host — they key the jit
    cache), then each host keeps only its round-robin scene shard; the
    returned ``statics`` are the per-host ones, the Trainer scales them to
    the global batch (``dist.launch.scale_statics``)."""
    import jax

    train_scenes = _load_scenes(cfg, "train")
    n_proc = jax.process_count() if distributed else 1
    global_bs = int(cfg.curriculum.batch_size)
    assert global_bs % n_proc == 0, (global_bs, n_proc)
    # statics sized for this host's share of the global batch
    statics = statics_from_cfg(cfg, train_scenes, batch_size=global_bs // n_proc)
    if distributed:
        from ..dist.launch import host_scene_shard

        train_scenes = host_scene_shard(train_scenes)
    model = WSISNet(
        NetConfig(
            classes=int(cfg.model.classes),
            input_channel=int(cfg.model.input_channel),
            use_coords=bool(cfg.model.use_coords),
            media=int(cfg.model.media),
            blocks=int(cfg.model.blocks),
            block_reps=int(cfg.model.block_reps),
        )
    )
    try:
        val_scenes = _load_scenes(cfg, "val")
    except Exception:
        val_scenes = []

    store = WeakLabelStore(
        {s.name: s for s in train_scenes},
        classes=int(cfg.model.classes),
        scale=float(cfg.data.scale),
    )
    store.acquire(
        np.random.default_rng(int(cfg.seed)), annotation_num=int(cfg.data.annotation_num)
    )

    is_s3dis = cfg.data.dataset == "s3dis"
    train_ds = SceneDataset(
        train_scenes,
        statics,
        weak_store=store,
        scale=float(cfg.data.scale),
        max_npoint=int(cfg.data.max_npoint),
        full_scale_hi=int(cfg.data.full_scale[1]),
        crop_mode="block" if is_s3dis else "shift",
        subsample=bool(cfg.data.get("subsample_train", False)) if is_s3dis else False,
    )
    val_ds = (
        SceneDataset(val_scenes, statics, scale=float(cfg.data.scale)) if val_scenes else None
    )
    cur = cfg.curriculum
    tcfg = CurriculumConfig(
        batch_size=int(cur.batch_size),
        lr=float(cfg.optimizer.lr),
        weight_decay=float(cfg.optimizer.weight_decay),
        poly_power=float(cfg.lr_scheduler.power),
        stage1_epochs=int(cur.stage1_epochs),
        joint_training_epoch=int(cur.joint_training_epoch),
        stage2_rounds=tuple(cur.stage2_rounds),
        stage3_epochs=int(cur.stage3_epochs),
        save_freq=int(cur.save_freq),
        eval_freq=int(cur.eval_freq),
        whole_scene_match_radius=float(cur.whole_scene_match_radius),
        log_dir=str(cfg.log_dir),
        seed=int(cfg.seed),
    )
    return model, statics, train_ds, val_ds, tcfg


def main(argv=None):
    p = argparse.ArgumentParser(description="tpu3dwsis training")
    p.add_argument("--config", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--data-parallel",
        action="store_true",
        help="GSPMD data parallelism over all local devices (single host)",
    )
    # multi-host (reference surface: --num-machines/--machine-rank/--dist-url,
    # train_scannetv2.py:34-44 — which the reference never actually wires up;
    # here one jax.distributed.initialize makes jax.devices() span all hosts).
    # On TPU pods all three are auto-discovered and --dist alone suffices.
    p.add_argument("--dist", action="store_true", help="multi-host via jax.distributed")
    p.add_argument("--dist-coordinator", default=None, help="host:port of process 0")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    p.add_argument("opts", nargs="*", help="dotted config overrides key=value")
    args = p.parse_args(argv)

    if args.dist:
        from ..dist.launch import initialize

        initialize(args.dist_coordinator, args.dist_num_processes, args.dist_process_id)
    import jax

    distributed = args.dist and jax.process_count() > 1

    cfg = Config.fromfile(args.config)
    Config.merge_from_options(cfg, args.opts)
    logger, log_dir = collect_logger(log_dir=str(cfg.log_dir))

    model, statics, train_ds, val_ds, tcfg = build_world(cfg, logger, distributed=distributed)
    mesh = None
    if distributed or args.data_parallel:
        from ..dist.mesh import make_mesh

        mesh = make_mesh()
        logger.info(
            "mesh: %d devices over %d hosts", mesh.devices.size, jax.process_count()
        )
    trainer_statics = statics
    if distributed:
        from ..dist.launch import scale_statics

        trainer_statics = scale_statics(statics, jax.process_count())
    trainer = Trainer(
        model,
        trainer_statics,
        train_ds,
        tcfg,
        val_dataset=val_ds,
        eval_statics=statics,
        data_mesh=mesh,
    )
    trainer.init_state()

    meta = None
    if args.resume:
        ckpt = latest_checkpoint(log_dir)
        if ckpt:
            is_main = jax.process_index() == 0
            trainer.state, meta = load_checkpoint(ckpt, trainer.state, None)
            saved_procs = int(meta.get("process_count", 1))
            if saved_procs != jax.process_count():
                # weak-label shards are per-host: a topology change makes the
                # stored shards meaningless.  Keep params/opt_state, keep the
                # freshly acquired base labels from build_world instead of
                # restoring a wrong shard.
                logger.warning(
                    "checkpoint written with %d processes, resuming with %d: "
                    "weak-label state NOT restored",
                    saved_procs, jax.process_count(),
                )
            elif is_main:
                from .checkpoint import load_weak_from_checkpoint

                load_weak_from_checkpoint(ckpt, train_ds.weak_store)
            else:
                from .checkpoint import load_weak_sidecar

                sidecar = f"{ckpt}_weak{jax.process_index()}"
                if not os.path.isdir(sidecar):
                    raise FileNotFoundError(
                        f"multi-host resume: weak-label sidecar {sidecar} is "
                        f"missing (checkpoint saved with process_count="
                        f"{saved_procs})"
                    )
                load_weak_sidecar(ckpt, jax.process_index(), train_ds.weak_store)
            trainer.apply_resume_meta(meta)
            logger.info(
                "resumed from %s (stage %s epoch %s)", ckpt, meta.get("stage"), meta.get("epoch")
            )

    trainer.run(resume_meta=meta)
    logger.info("training complete")


if __name__ == "__main__":
    main()
