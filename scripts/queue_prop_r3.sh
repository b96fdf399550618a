#!/bin/bash
# Queue item 2: PROPAGATION_r3 full rerun (see NEXT.md). One TPU job at a time.
cd /root/repo
PROP_OUT=/root/repo/PROPAGATION_r3.json PROP_EPOCHS=100,50,30,30,60 PROP_SAVE_FREQ=20 \
  exec bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
