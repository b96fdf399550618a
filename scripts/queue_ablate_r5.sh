#!/bin/bash
# Round-5 backward attribution, take 2 (VERDICT r4 #3).  The r5 single-
# process run OOMed at the `grad` probe: by then the process held the
# fwd_eval + fwd_train executables, their workspaces, TWO device batches
# and the train state — the grad program's peak no longer fit, and the
# poisoned allocator then crashed the remaining probes (.ablate_r5.log).
#
# Fix: memory-bounded PROBE GROUPS, one subprocess each (compile cache
# makes the repeated setup cheap; entries banked after every group).  The
# groups' union = the full attribution list; each group's log is kept.
cd /root/repo
rcall=0
for grp in grad train,opt unet_grad,ecc_grad points,losses,preprocess; do
  tag=$(echo "$grp" | tr ',' '-')
  ABL_WHAT="$grp" \
    bash scripts/tpu_snap_run.sh python scripts/ablate_step.py \
    > ".ablate_r5_${tag}.log" 2>&1
  rc=$?
  bash scripts/commit_cache.sh "Bank jax compile-cache entries after ablate group $tag"
  for p in ".ablate_r5_${tag}.log"; do git add -f $p 2>/dev/null || true; done
  git diff --cached --quiet || git commit -q -m "Bank ablate group $tag log"
  # rc 3/4 = chip guard refused (another job / round end): stop, keep rcall
  if [ $rc -eq 3 ] || [ $rc -eq 4 ]; then rcall=$rc; break; fi
  [ $rc -ne 0 ] && rcall=$rc
done
exit $rcall
