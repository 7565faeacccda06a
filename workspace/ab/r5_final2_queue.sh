#!/bin/bash
# Round-4 final queue v2: waits for capstone-v7 (pid via WAIT_PID), then
# v7 diag -> capstone-v8 (appearance-only arm: no refine, vert boost 2,
# snapped geometry, union alpha) -> v8 diag -> breadth recipes.
cd /root/repo
echo $$ > /tmp/r4final2.pid
LOG=workspace/runs/r4_final.log

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID $(date)" >> $LOG
  wait_pid "$WAIT_PID"
fi

echo "=== cap_diag ws96v7 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v7 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v7.log 2>&1
echo "=== cap_diag_v7 rc=$? $(date)" >> $LOG

echo "=== capstone-v8 (appearance-only) $(date)" >> $LOG
timeout 9000 python workspace/ab/r4_capstone_v8.py \
  > workspace/runs/r4capv8.log 2>&1
echo "=== capstone-v8 rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v8 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v8 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v8.log 2>&1
echo "=== cap_diag_v8 rc=$? $(date)" >> $LOG

echo "=== sdf_chip_run $(date)" >> $LOG
timeout 9000 python workspace/ab/sdf_chip_run.py \
  > workspace/runs/sdf_chip.log 2>&1
echo "=== sdf_chip_run rc=$? $(date)" >> $LOG

echo "=== colmap_chip_run $(date)" >> $LOG
timeout 7200 python workspace/ab/colmap_chip_run.py \
  > workspace/runs/colmap_chip.log 2>&1
echo "=== colmap_chip_run rc=$? $(date)" >> $LOG

echo "=== hard_full_recipe $(date)" >> $LOG
timeout 12000 python workspace/ab/hard_full_recipe.py \
  > workspace/runs/hard_full.log 2>&1
echo "=== hard_full_recipe rc=$? $(date)" >> $LOG

echo "=== r4_s1_perf_probe $(date)" >> $LOG
timeout 4800 python workspace/ab/r4_s1_perf_probe.py \
  > workspace/runs/s1_perf.log 2>&1
echo "=== s1_perf rc=$? $(date)" >> $LOG

echo "=== approx_ablations $(date)" >> $LOG
timeout 7200 python workspace/ab/approx_ablations.py \
  > workspace/runs/approx_ablations.log 2>&1
echo "=== ablations rc=$? $(date)" >> $LOG

echo "=== final2 queue done $(date)" >> $LOG
