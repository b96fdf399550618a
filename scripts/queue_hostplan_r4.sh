#!/bin/bash
# Round-4 hostplan A/B (VERDICT r3 #7): measure BENCH_HOSTPLAN=1 vs the
# r4 warm default (1.623 scenes/s, .bench_r4_warm.log).  If it wins, flip
# the default (then RE-WARM the plain bench before round end); if it loses,
# delete the flag + dead fields.
cd /root/repo
BENCH_HOSTPLAN=1 BENCH_SKIP_INF=1 \
  bash scripts/tpu_snap_run.sh python bench.py
rc=$?
# bank the fresh compile-cache entries (recycles wipe uncommitted files)
bash scripts/commit_cache.sh "Bank jax compile-cache entries after hostplan stage"
exit $rc
