#!/usr/bin/env python
"""Post-hoc evaluation of a curriculum checkpoint on a val split.

The reference validates mid-train every ``eval_freq`` epochs over the real
val split (``train_scannetv2.py:289-400``); the curriculum proxy runs keep
val small (8 rooms) to protect TPU time.  This script evaluates any saved
checkpoint on an arbitrarily large synthetic val split after the fact —
the "meaningful validation" artifact without re-training.

Usage:
  EVAL_CKPT=.bench_cache/prop_log/epoch_00060_whole_scene \
  EVAL_VAL_SCENES=32 EVAL_DENSITY=800 python scripts/eval_checkpoint.py

Writes EVAL_OUT (default VALEVAL.json): semantic mIoU (3 levels), ScanNet
AP/AP50/AP25 and prec/recall@0.5 over the split.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = os.environ.get("EVAL_CKPT", "")
N_VAL = int(os.environ.get("EVAL_VAL_SCENES", "32"))
DENSITY = float(os.environ.get("EVAL_DENSITY", "800"))
OUT = os.environ.get("EVAL_OUT", "VALEVAL.json")
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")


def main():
    if os.environ.get("EVAL_CPU"):  # smoke off-TPU (sitecustomize pins axon)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.loader import SceneDataset
    from tpu3dwsis.nn.network import NetConfig, WSISNet
    from tpu3dwsis.train.checkpoint import load_checkpoint
    from tpu3dwsis.infer.cli import evaluate_dataset
    from tpu3dwsis.utils.profiling import enable_compilation_cache

    if not CKPT:
        raise SystemExit("set EVAL_CKPT to a checkpoint directory")
    enable_compilation_cache(os.path.join(CACHE, "jax"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from propagation_curve import get_scenes  # same cache layout/seeds

    global_ns = sys.modules["propagation_curve"]
    global_ns.DENSITY = DENSITY  # get_scenes reads module globals
    val_scenes = get_scenes("prop_val", N_VAL, 5000)

    statics = fit_statics(
        val_scenes, batch_size=1, num_levels=5, max_instances=64,
        aug_margin=(1.0, 1.0, 1.0),
    )
    model = WSISNet(
        NetConfig(classes=20, media=32, blocks=5, unet_dtype="bfloat16",
                  ecc_edge_dtype="bfloat16")
    )
    state, meta = load_checkpoint(CKPT)
    ds = SceneDataset(val_scenes, statics)

    t0 = time.time()
    metrics = evaluate_dataset(model, state.params, state.batch_stats, ds)
    result = {
        "checkpoint": CKPT,
        "checkpoint_meta": {k: v for k, v in meta.items() if k != "rng_state"},
        "val_scenes": N_VAL,
        "density": DENSITY,
        "mean_points": int(np.mean([s.num_points for s in val_scenes])),
        "eval_seconds": round(time.time() - t0, 1),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["metrics"]))


if __name__ == "__main__":
    main()
