#!/usr/bin/env python
"""Propagation-accuracy curve on realistic synthetic rooms (VERDICT r1 #2b).

Runs the full 3-stage weak-label curriculum on surface-sampled room scenes at
ScanNet-like statistics (the strongest available proxy in a no-dataset-access
environment) and records the weak-label coverage/accuracy after the initial
acquire, after every stage-2 propagation round, and after the stage-3
whole-scene propagation — the reference logs exactly these after every
propagation pass (``scannetv2_dataset.py:599-661``).  Rising coverage at
sustained accuracy across rounds is the reference's published qualitative
behavior.

Finishes with the full inference protocol (BFS clustering + ScanNet-AP) on a
held-out val split.  Writes ``PROPAGATION_r2.json``.

Env knobs: PROP_TRAIN_SCENES (48), PROP_VAL_SCENES (8), PROP_DENSITY (800
pts/m^2 -> ~60k pts/scene; 2000 = full ScanNet density), PROP_BATCH (6),
PROP_EPOCHS ("24,12,10,10,16" = stage1,joint,round0,round1,stage3).
"""
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN = int(os.environ.get("PROP_TRAIN_SCENES", "48"))
N_VAL = int(os.environ.get("PROP_VAL_SCENES", "8"))
DENSITY = float(os.environ.get("PROP_DENSITY", "800"))
BATCH = int(os.environ.get("PROP_BATCH", "6"))
EP = [int(x) for x in os.environ.get("PROP_EPOCHS", "24,12,10,10,16").split(",")]
OUT = os.environ.get("PROP_OUT", "PROPAGATION_r2.json")
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")


def get_scenes(prefix, count, seed0):
    from tpu3dwsis.data.scene import load_scene, save_scene
    from tpu3dwsis.data.synthetic import make_room_scene

    os.makedirs(CACHE, exist_ok=True)
    out = []
    for i in range(count):
        path = os.path.join(CACHE, f"{prefix}_{DENSITY:.0f}_{i}.npz")
        if os.path.exists(path):
            out.append(load_scene(path))
        else:
            t0 = time.time()
            sc = make_room_scene(seed=seed0 + i, density=DENSITY)
            save_scene(sc, path)
            print(f"# built {sc.name}: {sc.num_points} pts ({time.time()-t0:.1f}s)", flush=True)
            out.append(sc)
    return out


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.loader import SceneDataset
    from tpu3dwsis.data.weak_labels import WeakLabelStore
    from tpu3dwsis.nn.network import NetConfig, WSISNet
    from tpu3dwsis.train.curriculum import CurriculumConfig, DeadlineReached, Trainer
    from tpu3dwsis.utils.profiling import enable_compilation_cache

    enable_compilation_cache(os.path.join(CACHE, "jax"))

    train_scenes = get_scenes("prop_room", N_TRAIN, 0)
    val_scenes = get_scenes("prop_val", N_VAL, 5000)
    statics = fit_statics(train_scenes, batch_size=BATCH, num_levels=5, max_instances=64)
    eval_statics = fit_statics(
        train_scenes + val_scenes, batch_size=1, num_levels=5, max_instances=64,
        aug_margin=(1.0, 1.0, 1.0),
    )
    model = WSISNet(
        NetConfig(classes=20, media=32, blocks=5, unet_dtype="bfloat16",
                  ecc_edge_dtype="bfloat16")
    )

    store = WeakLabelStore({s.name: s for s in train_scenes}, classes=20)
    store.acquire(np.random.default_rng(123), annotation_num=1)
    ds = SceneDataset(
        train_scenes, statics, weak_store=store,
    )
    val_ds = SceneDataset(val_scenes, eval_statics)

    curve = [{"event": "acquire", **store.label_stats()}]
    print(f"# acquire: {curve[-1]}", flush=True)

    # PROP_RESUME_CURVE=<json>: when resuming the SAME training run from a
    # stage checkpoint, carry over the events already recorded by the
    # interrupted run so the final artifact holds the full curve.
    prior = os.environ.get("PROP_RESUME_CURVE", "")
    if prior and os.path.exists(prior):
        with open(prior) as f:
            prev = json.load(f).get("curve", [])
        if prev and prev[0].get("event") == "acquire":
            curve = list(prev)
            print(f"# carried {len(curve)} curve events from {prior}", flush=True)

    def flush_partial():
        with open(OUT, "w") as f:
            json.dump({"status": "in_progress", "curve": curve,
                       "workload": {"train_scenes": N_TRAIN, "density": DENSITY,
                                    "batch": BATCH, "epochs": EP}}, f, indent=2)

    flush_partial()

    # PROP_DEADLINE_S: wall-clock budget for THIS launch.  Once passed, the
    # trainer checkpoints, a git-bankable resume file is written, and the
    # process exits 0 with the chip free — the next launch resumes.  This is
    # the round-3/4 lesson: long TPU jobs never survive to completion
    # (sessions end, containers recycle), so the curriculum must advance in
    # bounded, resumable slices.
    deadline_s = float(os.environ.get("PROP_DEADLINE_S", "0") or 0)
    cfg = CurriculumConfig(
        batch_size=BATCH,
        stage1_epochs=EP[0],
        joint_training_epoch=EP[1],
        stage2_rounds=tuple(EP[2:-1]),
        stage3_epochs=EP[-1],
        # mid-stage checkpoints so a container restart costs minutes, not a
        # whole stage (PROP_RESUME fast-forwards from the newest one)
        save_freq=int(os.environ.get("PROP_SAVE_FREQ", "20")),
        eval_freq=10_000,
        log_dir=os.path.join(CACHE, "prop_log"),
        deadline_ts=(time.time() + deadline_s) if deadline_s > 0 else None,
    )
    trainer = Trainer(model, statics, ds, cfg, val_dataset=val_ds, eval_statics=eval_statics)

    orig_prop, orig_whole = trainer.propagation_pass, trainer.whole_scene_pass

    def prop_hook(ind):
        orig_prop(ind)
        curve.append({"event": f"round{ind}", **store.label_stats()})
        print(f"# {curve[-1]}", flush=True)
        flush_partial()

    def whole_hook():
        orig_whole()
        curve.append({"event": "whole_scene", **store.label_stats()})
        print(f"# {curve[-1]}", flush=True)
        flush_partial()

    trainer.propagation_pass = prop_hook
    trainer.whole_scene_pass = whole_hook

    # PROP_RESUME=<ckpt dir> restarts an interrupted curriculum from a stage
    # checkpoint (TrainState + weak-label store + data-order RNG), mirroring
    # train/cli.py --resume; the curriculum fast-forwards past finished stages.
    resume_meta = None
    rck = os.environ.get("PROP_RESUME", "")
    if rck:
        from tpu3dwsis.train.checkpoint import load_checkpoint

        # abstract template: structure/shapes/dtypes only, zero device work —
        # the checkpoint overwrites every value (saves ~20 min of eager
        # relay-init per resume slice)
        trainer.init_state(abstract=True)
        trainer.state, meta = load_checkpoint(rck, trainer.state, store)
        trainer.apply_resume_meta(meta)
        resume_meta = meta
        curve.append(
            {"event": f"resume:{meta.get('stage')}@{meta.get('epoch')}",
             **store.label_stats()}
        )
        print(f"# resumed from {rck}: {curve[-1]}", flush=True)
        flush_partial()

    def write_bank(stage, epoch):
        """Compact resume state at a git-bankable path (the queue script
        commits it; git is the only storage a container recycle spares)."""
        from tpu3dwsis.train.checkpoint import save_checkpoint

        import json as _json

        os.makedirs(os.path.join(CACHE, "prop_bank"), exist_ok=True)
        save_checkpoint(
            os.path.join(CACHE, "prop_bank", "resume"),
            trainer.state,
            {
                "epoch": epoch,
                "stage": stage,
                "global_step": trainer.global_step,
                "process_count": 1,
                "rng_state": _json.dumps(trainer.rng.bit_generator.state),
            },
            store,
            bank=True,
        )

    t0 = time.time()
    try:
        trainer.run(resume_meta=resume_meta)
    except DeadlineReached as d:
        curve.append({"event": f"deadline_stop:{d.stage}@{d.epoch}",
                      **store.label_stats()})
        print(f"# {curve[-1]}", flush=True)
        flush_partial()
        write_bank(d.stage, d.epoch)
        print(f"# PROP_DEADLINE_S={deadline_s:.0f} reached at stage "
              f"{d.stage} epoch {d.epoch}; state banked, exiting cleanly",
              flush=True)
        return
    train_t = time.time() - t0
    # Bank the LAST REAL stage at its final epoch (not a synthetic 'done'
    # stage): if the post-training eval dies and the container recycles,
    # the next launch resumes from this bank and run() fast-forwards past
    # all stages straight to the eval, instead of crashing on an unknown
    # stage name (advisor r4 finding).
    write_bank("whole_scene", EP[-1])

    # persist the trained state so larger val sets can be evaluated post-hoc
    # without retraining (the curriculum itself only saves at save_freq)
    try:
        from tpu3dwsis.train.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(CACHE, "prop_final_ckpt"), trainer.state,
            meta={"stage": "done", "epoch": 0},
        )
    except Exception as e:  # noqa: BLE001 — eval is the primary artifact
        print(f"# final checkpoint save failed: {e!r}", flush=True)

    val = trainer.validate()
    from tpu3dwsis.infer.cli import evaluate_dataset

    metrics = evaluate_dataset(
        model, trainer.state.params, trainer.state.batch_stats, val_ds
    )
    result = {
        "status": "complete",
        "workload": {
            "train_scenes": N_TRAIN,
            "val_scenes": N_VAL,
            "density": DENSITY,
            "mean_points": int(np.mean([s.num_points for s in train_scenes])),
            "batch": BATCH,
            "epochs": EP,
            "train_seconds": round(train_t, 1),
        },
        "curve": curve,
        "final_val_semantic": val,
        "final_val_instance": {k: round(float(v), 4) for k, v in metrics.items()},
        "loss_history": trainer.history[-5:],
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["curve"], indent=1))
    print(json.dumps(result["final_val_instance"]))


if __name__ == "__main__":
    main()
