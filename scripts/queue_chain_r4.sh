#!/bin/bash
# Round-4 post-propagation TPU pipeline, strictly sequential (one job holds
# the chip at a time; tpu_snap_run.sh's pidfile guard would refuse overlap
# anyway).  Launch AFTER the propagation job exits.  Logs land next to the
# repo root like every other TPU job log.
set -u
cd /root/repo
echo $$ > /tmp/chain_r4.pid
# To stop the pipeline, remove a stage's marker below or `kill $(cat
# /tmp/chain_r4.pid)` BETWEEN stages (never kill a TPU job mid-compile).
# Stages can be skipped ad hoc: SKIP="hostplan spatialtpu" bash ...
SKIP=${SKIP:-}

run() {
  name=$1; shift
  # two skip channels: SKIP env at launch, or a /tmp/skip_<name> marker
  # created any time BEFORE the stage starts (steers a chain already
  # launched by the watcher when the night runs long)
  if [ -e "/tmp/skip_$name" ]; then
    echo "=== $(date -u +%H:%M:%S) chain: $name SKIPPED (marker) ===" >> .chain_r4.log
    return
  fi
  case " $SKIP " in *" $name "*)
    echo "=== $(date -u +%H:%M:%S) chain: $name SKIPPED ===" >> .chain_r4.log
    return ;;
  esac
  echo "=== $(date -u +%H:%M:%S) chain: $name start ===" >> .chain_r4.log
  "$@" > ".${name}_r4.log" 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) chain: $name rc=$rc ===" >> .chain_r4.log
  # bank everything a container recycle would destroy: the stage log, bench
  # variant sidecars (folded into the driver's BENCH artifact extras), and
  # JSON artifacts (the queue scripts bank the compile cache themselves)
  # each pathspec separately with || true: a multi-pathspec git add aborts
  # ENTIRELY (rc 128, nothing staged) when any pathspec matches nothing
  # (advisor r4 finding)
  git add -f ".${name}_r4.log" 2>/dev/null || true
  git add -f .bench_cache/bench_extra_*.json 2>/dev/null || true
  git add SPATIAL_tpu.json 2>/dev/null || true
  git add NEXT.md 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "Bank $name stage log + artifacts"
}

run ablate    bash scripts/queue_ablate_r4.sh
run batch10   bash scripts/queue_batch10_r4.sh
run hostplan  bash scripts/queue_hostplan_r4.sh
run spatialtpu bash scripts/queue_spatial_tpu_r4.sh
# Insurance for the driver's BENCH_r04: one plain warm bench at the end so
# the default-config compile cache is verifiably hot after all variant runs
# (it also folds the variant sidecars into the artifact's extras).
run warmbench bash scripts/tpu_snap_run.sh python bench.py
echo "=== $(date -u +%H:%M:%S) chain: DONE ===" >> .chain_r4.log
