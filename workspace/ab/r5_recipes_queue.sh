#!/bin/bash
# Round-4 recipes queue v2 (VERDICT #5/#6/#8 + stage-1 perf attribution):
# waits for the capstone queue, then runs the stage-1 profiler, the three
# chip-scale recipes, eval timing, and ablations.
# Stop with: kill $(cat /tmp/r4recipes.pid)
cd /root/repo
LOG=workspace/runs/r4_recipes.log

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

if [ -f /tmp/r4seq2.pid ]; then
  echo "=== waiting for capstone queue ($(cat /tmp/r4seq2.pid))" >> $LOG
  wait_pid "$(cat /tmp/r4seq2.pid)"
fi

echo "=== r4_s1_perf_probe $(date)" >> $LOG
timeout 4800 python workspace/ab/r4_s1_perf_probe.py \
  > workspace/runs/s1_perf.log 2>&1
echo "=== s1_perf rc=$? $(date)" >> $LOG

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

echo "=== recipes queue done $(date)" >> $LOG
