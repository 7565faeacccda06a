#!/bin/bash
# Round-5 main chip queue (VERDICT r4 tasks 1-3, 6):
#   bench (stage-1 component green after donation fix)
#   -> cap_diag_v9 (train/val estimator-vs-overfit decomposition)
#   -> s1 perf probe (step attribution, owed since r4)
#   -> capstone v10 norefine -> capstone v10 refine (full fix stack)
# Each step runs under the stale-log watchdog (axon relay stalls) and
# commits its artifacts at generation time (VERDICT r4 weak #9).
set -u
cd /root/repo
echo $$ > /tmp/r5main.pid
LOG=workspace/runs/r5_main.log
OUT=workspace/validation/round5
WD=workspace/ab/run_watchdog.sh
mkdir -p $OUT workspace/runs

step() {  # step <name> <logfile> <stale_min> <timeout_s> -- cmd...
  local name=$1 log=$2 stale=$3 tmo=$4; shift 5
  echo "=== $name start $(date)" >> $LOG
  timeout "$tmo" bash $WD "$log" "$stale" 2 -- "$@"
  local rc=$?
  echo "=== $name rc=$rc $(date)" >> $LOG
  git add -f "$log" 2>/dev/null
  git commit -q -m "round5 artifact: $name" 2>/dev/null || true
  return $rc
}

step bench_check $OUT/bench_r5_check.log 12 2400 -- python bench.py

CAP_WS=/root/repo/workspace/runs/ws96v9 CAP_SNAP=1 CAP_REFINE=0 \
  step cap_diag_v9 $OUT/cap_diag_v9.log 15 4800 -- \
  python workspace/ab/cap_diag.py 3

CAP_WS=/root/repo/workspace/runs/ws96v9 \
  step speckle_v9 $OUT/speckle_v9.log 15 4800 -- \
  python workspace/ab/r5_speckle_probe.py
git add -f $OUT/speckle_*.png 2>/dev/null
git commit -q -m "round5 artifact: speckle probe images" || true

step s1_perf $OUT/s1_perf.log 15 3600 -- \
  python workspace/ab/r4_s1_perf_probe.py

CAP10_ARM=norefine step cap_v10_norefine workspace/runs/r5capv10nr.log 20 10800 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10norefine_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 norefine metrics" || true

CAP10_ARM=shell step cap_v10_shell workspace/runs/r5capv10s.log 20 14400 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10shell_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 shell metrics" || true

CAP10_ARM=refine step cap_v10_refine workspace/runs/r5capv10r.log 20 10800 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10refine_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 refine metrics" || true

echo "=== r5 main queue done $(date)" >> $LOG
