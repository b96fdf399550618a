#!/bin/bash
# Run a TPU job from an immutable snapshot of HEAD so source edits in
# /root/repo can't race a queued run (compile cache + bench scenes shared
# via symlink).  Usage: tpu_snap_run.sh <cmd...>  (redirect output yourself)
#
# GUARD (VERDICT r3 #2): exactly one TPU job at a time.  The round-3 driver
# bench timed out because it collided with a still-running propagation job
# on the single chip.  A pidfile records the active job; launching while it
# is alive is refused.  Never kill a holder mid-compile — wait for it.
set -u
PIDFILE=/tmp/tpu_job.pid
if [ -f "$PIDFILE" ]; then
  oldpid=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$oldpid" ] && kill -0 "$oldpid" 2>/dev/null; then
    echo "REFUSED: TPU job pid $oldpid is still alive (see $PIDFILE)" >&2
    exit 3
  fi
fi
# ROUND-END GUARD (VERDICT r4 #2a): refuse to START a TPU stage inside the
# last 90 min of the round, so the driver's bench window is never contended.
# .round_end_ts is written at round start (unix ts of the expected round
# end); override for must-run jobs with TPU_GUARD_OVERRIDE=1.
ENDTS_FILE=/root/repo/.round_end_ts
if [ "${TPU_GUARD_OVERRIDE:-0}" != "1" ] && [ -f "$ENDTS_FILE" ]; then
  end_ts=$(cat "$ENDTS_FILE" 2>/dev/null)
  now=$(date +%s)
  if [ -n "$end_ts" ] && [ "$now" -gt "$((end_ts - 5400))" ] 2>/dev/null; then
    echo "REFUSED: inside the last 90 min of the round (end_ts=$end_ts); chip stays free for the driver bench" >&2
    exit 4
  fi
fi
# a FRESH release marker means a bench is alive and waiting for the chip
# right now (it re-touches the marker every 15 s) — yield to it instead of
# deleting its marker and racing it onto the chip.  A stale marker (>60 s)
# is a leftover from a dead process; clear it and proceed.
REL=/tmp/tpu_release
if [ -f "$REL" ]; then
  age=$(( $(date +%s) - $(stat -c %Y "$REL" 2>/dev/null || echo 0) ))
  if [ "$age" -lt 60 ]; then
    echo "REFUSED: a live bench holds $REL (age ${age}s); chip yields to it" >&2
    exit 4
  fi
fi
echo $$ > "$PIDFILE"
rm -f "$REL"
SNAP=/tmp/tpu_snap
if [ ! -d "$SNAP" ] || [ "$(cat $SNAP/.git_rev 2>/dev/null)" != "$(git -C /root/repo rev-parse HEAD)" ]; then
  rm -rf "$SNAP"; mkdir -p "$SNAP"
  git -C /root/repo archive HEAD | tar -x -C "$SNAP"
  rm -rf "$SNAP/.bench_cache"; ln -s /root/repo/.bench_cache "$SNAP/.bench_cache"
  git -C /root/repo rev-parse HEAD > "$SNAP/.git_rev"
fi
cd "$SNAP"
exec "$@"
