#!/usr/bin/env python
"""Mid-train validation curve from saved curriculum checkpoints.

The reference validates every ``eval_freq`` epochs over the real val split
(``train_scannetv2.py:289-400``).  The curriculum saves checkpoints every
PROP_SAVE_FREQ epochs; this script replays them all over a val split in ONE
process (one eval compile, N restores) and writes the mIoU/AP curve —
mid-train validation cadence without stealing TPU time from the run itself.

Usage:
  VC_GLOB='.bench_cache/prop_log/epoch_*' VC_VAL_SCENES=32 \
  VC_OUT=VAL_CURVE_r3.json python scripts/val_curve.py
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
PATTERN = os.environ.get("VC_GLOB", os.path.join(CACHE, "prop_log", "epoch_*"))
N_VAL = int(os.environ.get("VC_VAL_SCENES", "32"))
DENSITY = float(os.environ.get("VC_DENSITY", "800"))
OUT = os.environ.get("VC_OUT", "VAL_CURVE_r3.json")


def main():
    if os.environ.get("VC_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.loader import SceneDataset
    from tpu3dwsis.nn.network import NetConfig, WSISNet
    from tpu3dwsis.train.checkpoint import load_checkpoint
    from tpu3dwsis.infer.cli import evaluate_dataset
    from tpu3dwsis.utils.profiling import enable_compilation_cache

    enable_compilation_cache(os.path.join(CACHE, "jax"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from propagation_curve import get_scenes

    sys.modules["propagation_curve"].DENSITY = DENSITY
    val_scenes = get_scenes("prop_val", N_VAL, 5000)
    statics = fit_statics(
        val_scenes, batch_size=1, num_levels=5, max_instances=64,
        aug_margin=(1.0, 1.0, 1.0),
    )
    model = WSISNet(
        NetConfig(classes=20, media=32, blocks=5, unet_dtype="bfloat16",
                  ecc_edge_dtype="bfloat16")
    )
    ds = SceneDataset(val_scenes, statics)

    ckpts = sorted(p for p in glob.glob(PATTERN) if os.path.isdir(p))
    if not ckpts:
        raise SystemExit(f"no checkpoints match {PATTERN}")
    curve = []
    for ck in ckpts:
        state, meta = load_checkpoint(ck)
        t0 = time.time()
        metrics = evaluate_dataset(model, state.params, state.batch_stats, ds)
        curve.append({
            "checkpoint": os.path.basename(ck),
            "stage": meta.get("stage"),
            "epoch": meta.get("epoch"),
            "eval_seconds": round(time.time() - t0, 1),
            **{k: round(float(v), 4) for k, v in metrics.items()},
        })
        print(json.dumps(curve[-1]), flush=True)
        with open(OUT, "w") as f:
            json.dump({"val_scenes": N_VAL, "density": DENSITY,
                       "mean_points": int(np.mean([s.num_points for s in val_scenes])),
                       "curve": curve}, f, indent=2)


if __name__ == "__main__":
    main()
