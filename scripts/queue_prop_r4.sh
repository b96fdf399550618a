#!/bin/bash
# Round-4 propagation completion (VERDICT r3 #3): the r3 checkpoints were
# wiped with the container, so run the FULL curriculum fresh — acquire,
# stage-1/joint semantic training, stage-2 propagation rounds, stage-3
# whole-scene, then final eval on the 32-room val split (VERDICT r3 #9).
# Stage checkpoints (fast single-file npz since f2a3c2) land every 20
# epochs under .bench_cache/prop_log, so a crash costs minutes.
# One TPU job at a time (tpu_snap_run.sh enforces it).
#
# AUTO-RESUME: if a stage checkpoint exists (a prior attempt died — e.g.
# the session hosting the background task ended), fast-forward from the
# newest one and carry the already-recorded curve events, instead of
# repaying hours of finished epochs.
cd /root/repo
CKPT_DIR=/root/repo/.bench_cache/prop_log
RESUME=""
if [ -d "$CKPT_DIR" ]; then
  latest=$(ls -t "$CKPT_DIR"/epoch_*_*.npz 2>/dev/null \
             | grep -v '_weak[0-9]*\.npz$' | grep -v '\.tmp\.npz$' | head -1)
  if [ -n "$latest" ]; then
    RESUME="$latest"
    echo "# queue_prop_r4: resuming from $RESUME" >&2
  fi
fi
PROP_OUT=/root/repo/PROPAGATION_r4.json \
PROP_RESUME="$RESUME" \
PROP_RESUME_CURVE=/root/repo/PROPAGATION_r4.json \
PROP_EPOCHS=100,50,30,30,60 \
PROP_SAVE_FREQ=20 \
PROP_VAL_SCENES=32 \
  exec bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
