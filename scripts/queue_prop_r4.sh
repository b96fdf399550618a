#!/bin/bash
# Round-4 propagation completion: resume the r3 curriculum from its last
# stage checkpoint (round1 complete), run the whole-scene stage + final
# eval on the 32-room val split, write PROPAGATION_r4.json with
# status=complete.  One TPU job at a time (tpu_snap_run.sh enforces it).
cd /root/repo
PROP_OUT=/root/repo/PROPAGATION_r4.json \
PROP_EPOCHS=100,50,30,30,60 \
PROP_SAVE_FREQ=20 \
PROP_VAL_SCENES=32 \
PROP_RESUME=/root/repo/.bench_cache/prop_log/epoch_00030_round1 \
PROP_RESUME_CURVE=/root/repo/PROPAGATION_r3.json \
  exec bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
