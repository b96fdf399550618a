#!/bin/bash
# Round-4 unattended pipeline driver: wait for the propagation TPU job to
# finish, retry it (auto-resume from the newest stage checkpoint) if it died
# without completing, then hand the chip to the post-propagation chain
# (ablate -> batch10 -> hostplan -> spatialtpu -> warm bench).
#
# Exists because two sessions in a row lost their background TPU jobs when
# the session hosting them ended; this runs under setsid, detached from any
# session, and makes the whole night's queue self-healing.
set -u
cd /root/repo
PIDFILE=/tmp/tpu_job.pid
LOG=.watch_r4.log
RETRIES=0
MAX_RETRIES=3

note() { echo "$(date -u +%H:%M:%S) watch: $*" >> "$LOG"; }

note "started (pid $$)"
while :; do
  pid=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 60
    continue
  fi
  # TPU job gone: did propagation finish?
  status=$(python - <<'EOF'
import json
try:
    print(json.load(open("PROPAGATION_r4.json")).get("status", "missing"))
except Exception:
    print("missing")
EOF
)
  if [ "$status" = "complete" ]; then
    note "propagation complete; launching chain"
    break
  fi
  if [ "$RETRIES" -ge "$MAX_RETRIES" ]; then
    note "propagation incomplete after $RETRIES retries; launching chain anyway"
    break
  fi
  RETRIES=$((RETRIES + 1))
  note "propagation job dead with status=$status; retry $RETRIES (auto-resume)"
  sleep 30   # let a crashed TPU attachment settle before re-attaching
  setsid nohup bash scripts/queue_prop_r4.sh >> .prop_r4.log 2>&1 < /dev/null &
  sleep 120  # give it time to claim the pidfile
done
exec bash scripts/queue_chain_r4.sh
