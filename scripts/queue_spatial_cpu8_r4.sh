#!/bin/bash
# Round-4 spatial-sharding scale artifact on the 8-virtual-device CPU mesh
# (VERDICT r3 #6): 2M+ points over 8 slabs with real collectives. Runs off
# the chip (SPATIAL_PLATFORM=cpu guards against attaching to the TPU), so
# it can overlap the propagation TPU job — niced, since both share the one
# physical core. Expect >1 h: the single core executes the 8 shard
# programs nearly serially (rendezvous timeouts already raised by
# bench_spatial.py). SPATIAL_REPS=1: one timed forward is the artifact;
# 4 reps would quadruple a multi-hour run for no extra information.
# POINTS=1e6: the 2.14M-pt attempt was OOM-killed at 119 GB anon RSS
# (8 shard programs' live sets are concurrent on XLA:CPU; 125 GB box) —
# dmesg 19365.04, .spatial_cpu8_r4b.log.  1e6 fits the measured ceiling.
cd /root/repo
SPATIAL_PLATFORM=cpu \
SPATIAL_POINTS=1e6 \
SPATIAL_SHARDS=8 \
SPATIAL_REPS=1 \
SPATIAL_OUT=/root/repo/SPATIAL_cpu8.json \
  exec nice -n 15 python scripts/bench_spatial.py
