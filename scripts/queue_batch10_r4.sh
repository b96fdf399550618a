#!/bin/bash
# Round-4 batch-10 proof (VERDICT r3 #5, third ask): the reference's
# published recipe batch size (ScanNet_v2_3D_WSIS.yaml:22) with remat on.
# bench_room_12..19 are cached; compile is fresh for the batch-10 shapes.
cd /root/repo
BENCH_BATCH=10 BENCH_REMAT=1 BENCH_SKIP_INF=1 \
  bash scripts/tpu_snap_run.sh python bench.py
rc=$?
# bank the fresh compile-cache entries (recycles wipe uncommitted files)
bash scripts/commit_cache.sh "Bank jax compile-cache entries after batch-10 stage"
exit $rc
