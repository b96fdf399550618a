#!/bin/bash
# Round-4 propagation completion (VERDICT r3 #3): the r3 checkpoints were
# wiped with the container, so run the FULL curriculum fresh — acquire,
# stage-1/joint semantic training, stage-2 propagation rounds, stage-3
# whole-scene, then final eval on the 32-room val split (VERDICT r3 #9).
# Stage checkpoints (fast single-file npz since f2ac3d2) land every 20
# epochs under .bench_cache/prop_log, so a crash costs minutes.
# One TPU job at a time (tpu_snap_run.sh enforces it).
cd /root/repo
PROP_OUT=/root/repo/PROPAGATION_r4.json \
PROP_EPOCHS=100,50,30,30,60 \
PROP_SAVE_FREQ=20 \
PROP_VAL_SCENES=32 \
  exec bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
