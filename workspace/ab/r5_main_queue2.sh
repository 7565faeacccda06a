#!/bin/bash
# Round-5 main queue v2 (post-diagnosis reorder): the speckle probe proved
# the single-sample mesh path broken even with the pristine stage-0 field,
# so the shell arm is the money run.  shell_probe (K/h calibration, no
# training) -> s1_perf -> capstone shell -> norefine (v9 repro control)
# -> refine.
set -u
cd /root/repo
echo $$ > /tmp/r5main2.pid
LOG=workspace/runs/r5_main.log
OUT=workspace/validation/round5
WD=workspace/ab/run_watchdog.sh
mkdir -p $OUT workspace/runs

# wait for any in-flight probe from queue v1 (pid arg 1)
if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 $(date)" >> $LOG
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

step() {
  local name=$1 log=$2 stale=$3 tmo=$4; shift 5
  echo "=== $name start $(date)" >> $LOG
  timeout "$tmo" bash $WD "$log" "$stale" 2 -- "$@"
  local rc=$?
  echo "=== $name rc=$rc $(date)" >> $LOG
  git add -f "$log" 2>/dev/null
  git commit -q -m "round5 artifact: $name" 2>/dev/null || true
  return $rc
}

CAP_WS=/root/repo/workspace/runs/ws96v9 \
  step shell_probe $OUT/shell_probe.log 18 5400 -- \
  python workspace/ab/r5_shell_probe.py
git add -f $OUT/shellprobe_*.png 2>/dev/null
git commit -q -m "round5 artifact: shell probe images" || true

step s1_perf $OUT/s1_perf.log 18 3600 -- \
  python workspace/ab/r4_s1_perf_probe.py

# shell K/h from the probe's winner (overridable before launch)
CAP10_ARM=shell CAP10_SHELL_K="${SHELL_K:-8}" CAP10_SHELL_H="${SHELL_H:-0.04}" \
  step cap_v10_shell workspace/runs/r5capv10s.log 25 14400 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10shell_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 shell metrics" || true

CAP10_ARM=norefine step cap_v10_norefine workspace/runs/r5capv10nr.log 25 10800 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10norefine_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 norefine metrics" || true

CAP10_ARM=refine step cap_v10_refine workspace/runs/r5capv10r.log 25 10800 -- \
  python workspace/ab/r5_capstone_v10.py
git add -f $OUT/cap96v10refine_* 2>/dev/null
git commit -q -m "round5 artifact: capstone v10 refine metrics" || true

echo "=== r5 main queue v2 done $(date)" >> $LOG
