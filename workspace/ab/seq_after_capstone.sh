#!/bin/bash
# Chains the quick chip measurements after the capstone run (PID in
# /tmp/r3cap.pid) exits.  Long runs (hard_full_recipe, ablations) are
# launched manually afterwards so results can be reviewed in between.
set -u
PID=$(cat /tmp/r3cap.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "=== capstone exited, starting measurement queue $(date -u)"
cd /tmp
echo "=== stoch_decompose"
timeout 3600 python /root/repo/workspace/ab/stoch_decompose.py 2>&1 | grep -v Warning
echo "=== eval_timing_96aa"
timeout 2400 python /root/repo/workspace/ab/eval_timing_96aa.py 2>&1 | grep -v Warning
echo "=== bench default (stochastic ON)"
timeout 3600 python /root/repo/bench.py 2>&1 | tail -2
echo "=== bench exact"
NERF2MESH_BENCH_STOCHASTIC=0 timeout 3600 python /root/repo/bench.py 2>&1 | tail -2
echo "=== queue done $(date -u)"
