#!/bin/bash
# Run a TPU job from an immutable snapshot of HEAD so source edits in
# /root/repo can't race a queued run (compile cache + bench scenes shared
# via symlink).  Usage: tpu_snap_run.sh <cmd...>  (redirect output yourself)
set -u
SNAP=/tmp/tpu_snap
if [ ! -d "$SNAP/.git_rev" ] || [ "$(cat $SNAP/.git_rev 2>/dev/null)" != "$(git -C /root/repo rev-parse HEAD)" ]; then
  rm -rf "$SNAP"; mkdir -p "$SNAP"
  git -C /root/repo archive HEAD | tar -x -C "$SNAP"
  rm -rf "$SNAP/.bench_cache"; ln -s /root/repo/.bench_cache "$SNAP/.bench_cache"
  git -C /root/repo rev-parse HEAD > "$SNAP/.git_rev"
fi
cd "$SNAP"
exec "$@"
