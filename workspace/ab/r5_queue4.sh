#!/bin/bash
# Round-5 queue 4 (final): after colmap -> sdf (65k-point budget) ->
# trimmed hard_full (3000+1200 stage-0, 1500 stage-1).
set -u
cd /root/repo
echo $$ > /tmp/r5q4.pid
LOG=workspace/runs/r5_main.log
OUT=workspace/validation/round5
WD=workspace/ab/run_watchdog.sh

if [ -n "${1:-}" ]; then
  echo "=== q4 waiting for pid $1 $(date)" >> $LOG
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

step() {
  local name=$1 log=$2 stale=$3 tmo=$4; shift 5
  echo "=== $name start $(date)" >> $LOG
  timeout "$tmo" bash $WD "$log" "$stale" 1 -- "$@"
  local rc=$?
  echo "=== $name rc=$rc $(date)" >> $LOG
  git add -f "$log" $OUT 2>/dev/null
  git commit -q -m "round5 artifact: $name" 2>/dev/null || true
  return $rc
}

step sdf_chip2 $OUT/sdf_chip.log 25 7200 -- \
  python workspace/ab/sdf_chip_run.py

HARD_ITERS0=3000 step hard_full $OUT/hard_full.log 30 10800 -- \
  python workspace/ab/hard_full_recipe.py

echo "=== r5 queue4 done $(date)" >> $LOG
