#!/bin/bash
# Round-4 backward attribution (VERDICT r3 #4): account the ~1.85 s backward
# to components.  train/fwd_eval share compile-cache entries with bench.py;
# grad/fwd_train/unet/unet_grad/ecc_grad/losses/opt compile fresh (remote
# service, minutes each).  One TPU job at a time (tpu_snap_run.sh enforces).
cd /root/repo
ABL_WHAT=train,fwd_train,grad,opt,unet_grad,ecc_grad,points,losses \
  bash scripts/tpu_snap_run.sh python scripts/ablate_step.py
rc=$?
# bank the fresh compile-cache entries (recycles wipe uncommitted files)
bash scripts/commit_cache.sh "Bank jax compile-cache entries after ablate stage"
exit $rc
