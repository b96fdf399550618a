#!/bin/bash
# Round-5 TPU pipeline, strictly sequential, detached-safe.  Order:
#   1. propagation slices until PROPAGATION_r5.json is complete
#   2. backward attribution   3. batch-10 proof
#   4. spatial-tpu            5. final plain warm bench
# Every stage banks its log + artifacts in git immediately (container
# recycles spare only the checkout).  tpu_snap_run.sh enforces one job at a
# time AND the round-end guard (refuses new stages in the last 90 min), so
# a chain that runs long simply stops launching — the chip ends the round
# idle with warm caches, which is what the driver's bench needs.
set -u
cd /root/repo
echo $$ > /tmp/chain_r5.pid
SKIP=${SKIP:-}

bank() {  # each pathspec separately; one missing glob must not abort the rest
  for p in "$@"; do git add -f $p 2>/dev/null || true; done
  git diff --cached --quiet || git commit -q -m "Bank chain stage log + artifacts"
}

run() {
  name=$1; shift
  if [ -e "/tmp/skip_$name" ]; then
    echo "=== $(date -u +%H:%M:%S) chain: $name SKIPPED (marker) ===" >> .chain_r5.log
    return 0
  fi
  case " $SKIP " in *" $name "*)
    echo "=== $(date -u +%H:%M:%S) chain: $name SKIPPED ===" >> .chain_r5.log
    return 0 ;;
  esac
  echo "=== $(date -u +%H:%M:%S) chain: $name start ===" >> .chain_r5.log
  "$@" > ".${name}_r5.log" 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) chain: $name rc=$rc ===" >> .chain_r5.log
  bank ".${name}_r5.log" ".chain_r5.log" ".bench_cache/bench_extra_*.json" \
       "SPATIAL_tpu.json" "PROPAGATION_r5.json"
  return $rc
}

# --- 1. propagation slices until complete (bounded; guard stops late launches)
for i in 1 2 3 4 5 6; do
  if python - <<'EOF'
import json, sys
try:
    sys.exit(0 if json.load(open("PROPAGATION_r5.json")).get("status") == "complete" else 1)
except Exception:
    sys.exit(1)
EOF
  then break; fi
  run "prop_s$i" bash scripts/queue_prop_r5.sh
  rc=$?
  # rc 3 = another job holds the chip, rc 4 = round-end guard: stop the loop
  if [ $rc -eq 3 ] || [ $rc -eq 4 ]; then break; fi
done

run ablate     bash scripts/queue_ablate_r5.sh
run batch10    bash scripts/queue_batch10_r4.sh
run spatialtpu bash scripts/queue_spatial_tpu_r4.sh
# Insurance for the driver's BENCH_r05: one plain warm bench at the end so
# the default-config compile cache is verifiably hot after all variant runs.
run warmbench  bash scripts/tpu_snap_run.sh python bench.py
echo "=== $(date -u +%H:%M:%S) chain: DONE ===" >> .chain_r5.log
bank ".chain_r5.log"
