#!/bin/bash
# Round-4 final queue: v6 (stochastic arm, killed at step ~1700) diagnostic,
# eval timing, then capstone-v7 (union + capped refine + EXACT stage-1
# encode) and the breadth recipes.  Self-records its pid.
cd /root/repo
echo $$ > /tmp/r4final.pid
LOG=workspace/runs/r4_final.log

echo "=== cap_diag ws96v6 (stochastic arm) $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v6 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v6.log 2>&1
echo "=== cap_diag_v6 rc=$? $(date)" >> $LOG

echo "=== eval_timing_96aa $(date)" >> $LOG
timeout 3600 python workspace/ab/eval_timing_96aa.py \
  > workspace/runs/eval_timing_r4.log 2>&1
echo "=== eval_timing rc=$? $(date)" >> $LOG

echo "=== capstone-v7 $(date)" >> $LOG
timeout 14400 python workspace/ab/r4_capstone_v7.py \
  > workspace/runs/r4capv7.log 2>&1
echo "=== capstone-v7 rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v7 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v7 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v7.log 2>&1
echo "=== cap_diag_v7 rc=$? $(date)" >> $LOG

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

echo "=== final queue done $(date)" >> $LOG
