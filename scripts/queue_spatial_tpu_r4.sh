#!/bin/bash
# Round-4 spatial scale artifact on the chip (VERDICT r3 #6): 10M-point
# batched whole-scene sharded eval (degenerates to 1 slab on the single
# chip — still the largest-workload forward; BASELINE config 5).
cd /root/repo
SPATIAL_OUT=/root/repo/SPATIAL_tpu.json \
  bash scripts/tpu_snap_run.sh python scripts/bench_spatial.py
rc=$?
# bank the fresh compile-cache entries (recycles wipe uncommitted files)
bash scripts/commit_cache.sh "Bank jax compile-cache entries after spatial-tpu stage"
exit $rc
