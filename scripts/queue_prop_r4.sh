#!/bin/bash
# Round-4 propagation completion (VERDICT r3 #3), in BOUNDED RESUMABLE
# SLICES: long TPU jobs never survive to completion here (sessions end,
# containers recycle — rounds 2/3/4 each lost a running curriculum), so
# each launch trains for PROP_DEADLINE_S seconds (default 45 min), then
# checkpoints, writes a compact git-bankable resume file, and exits 0 with
# the chip free.  This script commits the bank + curve afterwards, so the
# NEXT launch — any session, any container — continues where this one
# stopped.  One TPU job at a time (tpu_snap_run.sh enforces it).
#
# Resume priority: newest full checkpoint in .bench_cache/prop_log (same
# container), else the git-banked .bench_cache/prop_bank/resume.npz
# (survives recycles; optimizer re-inits + schedule fast-forwards).
cd /root/repo
if python - <<'EOF'
import json, sys
try:
    sys.exit(0 if json.load(open("PROPAGATION_r4.json")).get("status") == "complete" else 1)
except Exception:
    sys.exit(1)
EOF
then
  echo "# queue_prop_r4: PROPAGATION_r4.json already complete; nothing to do" >&2
  exit 0
fi
CKPT_DIR=/root/repo/.bench_cache/prop_log
BANK=/root/repo/.bench_cache/prop_bank/resume.npz
RESUME=""
if [ -d "$CKPT_DIR" ]; then
  latest=$(ls -t "$CKPT_DIR"/epoch_*_*.npz 2>/dev/null \
             | grep -v '_weak[0-9]*\.npz$' | grep -v '\.tmp\.npz$' | head -1)
  [ -n "$latest" ] && RESUME="$latest"
fi
if [ -z "$RESUME" ] && [ -f "$BANK" ]; then
  RESUME="$BANK"
fi
[ -n "$RESUME" ] && echo "# queue_prop_r4: resuming from $RESUME" >&2
PROP_OUT=/root/repo/PROPAGATION_r4.json \
PROP_RESUME="$RESUME" \
PROP_RESUME_CURVE=/root/repo/PROPAGATION_r4.json \
PROP_EPOCHS=${PROP_EPOCHS:-100,50,30,30,60} \
PROP_SAVE_FREQ=${PROP_SAVE_FREQ:-20} \
PROP_VAL_SCENES=${PROP_VAL_SCENES:-32} \
PROP_DEADLINE_S=${PROP_DEADLINE_S:-2700} \
  bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
rc=$?
# bank everything a recycle would otherwise destroy
git add -f .bench_cache/prop_bank/resume.npz 2>/dev/null
git add PROPAGATION_r4.json 2>/dev/null
git diff --cached --quiet || git commit -q -m "Bank propagation resume state + curve after a bounded slice"
bash scripts/commit_cache.sh "Bank jax compile-cache entries after a propagation slice"
exit $rc
