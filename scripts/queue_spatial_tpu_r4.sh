#!/bin/bash
# Spatial scale artifact on the chip (VERDICT r3 #6 / r4 #7): batched
# whole-scene sharded eval (degenerates to 1 slab on the single chip —
# still the largest-workload forward; BASELINE config 5).
#
# Descending point-count ladder: the 10M-pt north star may not fit the
# relay slice's HBM, and an OOM there would otherwise end the stage with
# no artifact at all.  Try 10M, then halve; first success wins (VERDICT:
# "largest point count that fits, >=2M").  Each rung's compile entries are
# banked immediately so a recycle never repays them.
cd /root/repo
for pts in 1e7 5e6 2.5e6; do
  SPATIAL_OUT=/root/repo/SPATIAL_tpu.json SPATIAL_POINTS=$pts \
    bash scripts/tpu_snap_run.sh python scripts/bench_spatial.py
  rc=$?
  bash scripts/commit_cache.sh "Bank jax compile-cache entries after spatial-tpu attempt ($pts pts, rc=$rc)"
  # rc 3/4 = chip guard refused (another job / round end): do not descend
  [ $rc -eq 0 ] && break
  [ $rc -eq 3 ] && break
  [ $rc -eq 4 ] && break
done
exit $rc
