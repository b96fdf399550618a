#!/bin/bash
# Round-5 propagation completion (VERDICT r4 #1): ONE bounded resumable
# slice of the weak-label curriculum per invocation.  The schedule is the
# VERDICT-sanctioned shrink (60,30,20,20,40: stage1 60 epochs / joint from
# 31, two propagation rounds of 20, whole-scene 40 — 140 epochs total,
# ~34 s/epoch warm) so the curriculum COMPLETES inside the round instead of
# stalling at scale ("a COMPLETE small curriculum beats a stalled full
# one").  Resumes round 4's banked semantic@1 state, carries its curve.
#
# Resume priority: newest full checkpoint in .bench_cache/prop_log (same
# container), else the git-banked .bench_cache/prop_bank/resume.npz
# (survives recycles; optimizer re-inits + schedule fast-forwards).
cd /root/repo
OUT=/root/repo/PROPAGATION_r5.json
if python - <<'EOF'
import json, sys
try:
    sys.exit(0 if json.load(open("PROPAGATION_r5.json")).get("status") == "complete" else 1)
except Exception:
    sys.exit(1)
EOF
then
  echo "# queue_prop_r5: PROPAGATION_r5.json already complete; nothing to do" >&2
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
[ -n "$RESUME" ] && echo "# queue_prop_r5: resuming from $RESUME" >&2
# curve carry: this run's own partial artifact once it exists, else round 4's
CURVE=/root/repo/PROPAGATION_r5.json
[ -f "$CURVE" ] || CURVE=/root/repo/PROPAGATION_r4.json
PROP_OUT="$OUT" \
PROP_RESUME="$RESUME" \
PROP_RESUME_CURVE="$CURVE" \
PROP_EPOCHS=${PROP_EPOCHS:-60,30,20,20,40} \
PROP_SAVE_FREQ=${PROP_SAVE_FREQ:-10} \
PROP_VAL_SCENES=${PROP_VAL_SCENES:-32} \
PROP_DEADLINE_S=${PROP_DEADLINE_S:-10800} \
  bash scripts/tpu_snap_run.sh python scripts/propagation_curve.py
rc=$?
# bank everything a recycle would otherwise destroy — each add on its own
# line with `|| true` (a multi-pathspec add aborts ENTIRELY when one
# pathspec matches nothing; advisor r4 finding)
git add -f .bench_cache/prop_bank/resume.npz 2>/dev/null || true
git add PROPAGATION_r5.json 2>/dev/null || true
git diff --cached --quiet || git commit -q -m "Bank propagation resume state + curve after a bounded slice"
bash scripts/commit_cache.sh "Bank jax compile-cache entries after a propagation slice"
exit $rc
