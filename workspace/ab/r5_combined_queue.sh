#!/bin/bash
# Round-4 combined queue v4: waits for the in-flight s1_perf probe, then
# capstone-v6 (fresh ws96v6; snap-v2 + capped-retry refine + stochastic
# stage-1, 3000 iters) -> diag -> eval timing -> breadth recipes.
# Records its OWN pid (the $! of a nohup'd script under the harness shell
# captured a wrapper pid — that orphaned the first v6 run).
# Stop with: kill $(cat /tmp/r4comb.pid) + the child listed in $LOG.
cd /root/repo
echo $$ > /tmp/r4comb.pid
LOG=workspace/runs/r4_comb.log

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID $(date)" >> $LOG
  wait_pid "$WAIT_PID"
fi

echo "=== capstone-v6 $(date)" >> $LOG
timeout 14400 python workspace/ab/r4_capstone_v6.py \
  > workspace/runs/r4capv6.log 2>&1
echo "=== capstone-v6 rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v6 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v6 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v6.log 2>&1
echo "=== cap_diag_v6 rc=$? $(date)" >> $LOG

echo "=== eval_timing_96aa $(date)" >> $LOG
timeout 3600 python workspace/ab/eval_timing_96aa.py \
  > workspace/runs/eval_timing_r4.log 2>&1
echo "=== eval_timing rc=$? $(date)" >> $LOG

echo "=== sdf_chip_run $(date)" >> $LOG
timeout 10800 python workspace/ab/sdf_chip_run.py \
  > workspace/runs/sdf_chip.log 2>&1
echo "=== sdf_chip_run rc=$? $(date)" >> $LOG

echo "=== colmap_chip_run $(date)" >> $LOG
timeout 7200 python workspace/ab/colmap_chip_run.py \
  > workspace/runs/colmap_chip.log 2>&1
echo "=== colmap_chip_run rc=$? $(date)" >> $LOG

echo "=== hard_full_recipe $(date)" >> $LOG
timeout 14400 python workspace/ab/hard_full_recipe.py \
  > workspace/runs/hard_full.log 2>&1
echo "=== hard_full_recipe rc=$? $(date)" >> $LOG

echo "=== approx_ablations $(date)" >> $LOG
timeout 7200 python workspace/ab/approx_ablations.py \
  > workspace/runs/approx_ablations.log 2>&1
echo "=== ablations rc=$? $(date)" >> $LOG

echo "=== layout_ab $(date)" >> $LOG
timeout 7200 python workspace/ab/layout_ab.py \
  > workspace/runs/layout_ab.log 2>&1
echo "=== layout_ab rc=$? $(date)" >> $LOG

echo "=== combined queue done $(date)" >> $LOG
