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
echo $$ > "$PIDFILE"
SNAP=/tmp/tpu_snap
if [ ! -d "$SNAP" ] || [ "$(cat $SNAP/.git_rev 2>/dev/null)" != "$(git -C /root/repo rev-parse HEAD)" ]; then
  rm -rf "$SNAP"; mkdir -p "$SNAP"
  git -C /root/repo archive HEAD | tar -x -C "$SNAP"
  rm -rf "$SNAP/.bench_cache"; ln -s /root/repo/.bench_cache "$SNAP/.bench_cache"
  git -C /root/repo rev-parse HEAD > "$SNAP/.git_rev"
fi
cd "$SNAP"
exec "$@"
