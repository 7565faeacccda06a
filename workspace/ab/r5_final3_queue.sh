#!/bin/bash
# Round-4 final queue v3: wait for v8's export, then v8 diag -> capstone-v9
# (v8 config + full shading from step 0) -> v9 diag -> sdf -> colmap ->
# hard_full (if time).  Self-records pid.
cd /root/repo
echo $$ > /tmp/r4final3.pid
LOG=workspace/runs/r4_final.log

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 20; done; }

if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID $(date)" >> $LOG
  wait_pid "$WAIT_PID"
fi

echo "=== cap_diag ws96v8 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v8 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v8.log 2>&1
echo "=== cap_diag_v8 rc=$? $(date)" >> $LOG

echo "=== capstone-v9 (full shading from step 0) $(date)" >> $LOG
timeout 9000 python workspace/ab/r4_capstone_v9.py \
  > workspace/runs/r4capv9.log 2>&1
echo "=== capstone-v9 rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v9 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v9 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v9.log 2>&1
echo "=== cap_diag_v9 rc=$? $(date)" >> $LOG

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

echo "=== final3 queue done $(date)" >> $LOG
