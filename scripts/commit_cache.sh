#!/bin/bash
# Bank the jax persistent compile cache in git (container recycles wipe
# everything outside the repo checkout — rounds 2/3/4 each lost hours of
# remote-service compiles to this; see ee7ed16).  Scene .npz caches are
# deterministic (scripts/regen_scenes.py, ~3 min) and stay uncommitted;
# compile-cache entries are NOT reproducible cheaply (15-40 min for the
# train step), so they get committed after every TPU stage.
#
# Usage: bash scripts/commit_cache.sh [message]
set -u
cd /root/repo
git add -f .bench_cache/jax 2>/dev/null
if git diff --cached --quiet; then
  echo "commit_cache: no new compile-cache entries"
  exit 0
fi
n=$(git diff --cached --name-only | wc -l)
git commit -q -m "${1:-Bank $n jax compile-cache entries (survive container recycles)}"
echo "commit_cache: committed $n entries"
