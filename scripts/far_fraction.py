#!/usr/bin/env python
"""Far-row fraction of the windowed kernel on REAL bench-scene rulebooks,
per U-Net level and window size — picks the smallest window whose far
fraction stays negligible (the one-hot gather matmul cost is linear in the
window length, so this directly scales the U-Net's forward/backward time).
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from tpu3dwsis.core.buckets import fit_statics
from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
from tpu3dwsis.nn.network import preprocess
from tpu3dwsis.ops.pallas_spconv2 import _group_offsets, _plan_windows, derive_pos

BATCH = int(os.environ.get("FF_BATCH", "2"))
TILE = int(os.environ.get("FF_TILE", "256"))
CHANNELS = [32, 64, 96, 128, 160]


def main():
    scenes = bench.get_scenes()[:BATCH]
    statics = fit_statics(scenes, batch_size=BATCH, scale=50.0, num_levels=5,
                          max_instances=64)
    rng = np.random.default_rng(0)

    def labels_for(s):
        return SceneLabels(
            point_sem=s.sem, point_ins=s.ins, sp_sem=s.sp_sem_gt, sp_ins=s.sp_ins_gt,
            sp_offset=s.sp_offset_gt,
            sp_occupancy=np.full(s.num_superpoints, 400.0, np.float32),
            sp_size=np.ones(s.num_superpoints, np.float32),
        )

    arrays = collate(scenes, [labels_for(s) for s in scenes], statics, rng,
                     training=True)
    batch = to_scene_batch(arrays)
    pre = preprocess(batch, statics)

    rows = []
    for lv, lp in enumerate(pre.plan.levels):
        c = CHANNELS[lv]
        nbr = np.asarray(lp.subm_nbr)
        k, m = nbr.shape
        n_hit = int((nbr < m).sum())
        for window in (256, 512, 1024, 2048):
            p = max(1, 128 // c)
            pos, ok = derive_pos(jax.numpy.asarray(nbr), m)
            mp = -(-m // p) * p
            if mp < window:
                continue
            _, far = _plan_windows(pos, ok, TILE, window, p, mp,
                                   group_size=_group_offsets(k))
            n_far = int(np.asarray(far).sum())
            rows.append({"level": lv, "c": c, "m": m, "window": window,
                         "hits": n_hit, "far": n_far,
                         "far_frac": round(n_far / max(n_hit, 1), 5)})
            print(json.dumps(rows[-1]), flush=True)

        # down-table far fractions at this level (gather source = fine level)
        if lp.down_nbr is not None:
            dn = np.asarray(lp.down_nbr)
            kd, mc = dn.shape
            n_hit = int((dn < m).sum())
            for window in (256, 512, 1024, 2048):
                p = max(1, 128 // c)
                pos, ok = derive_pos(jax.numpy.asarray(dn), m)
                mp = -(-m // p) * p
                if mp < window or mc % TILE:
                    continue
                _, far = _plan_windows(pos, ok, TILE, window, p, mp,
                                       group_size=_group_offsets(kd))
                n_far = int(np.asarray(far).sum())
                print(json.dumps({"level": f"{lv}down", "c": c, "m": mc,
                                  "window": window, "hits": n_hit, "far": n_far,
                                  "far_frac": round(n_far / max(n_hit, 1), 5)}),
                      flush=True)


if __name__ == "__main__":
    main()
