#!/bin/bash
# Round-5 recipe queue (VERDICT r4 task 5, owed since round 1):
# BASELINE configs 2-4 analogs — sdf (NeuS + chamfer), colmap (bound-4
# cascades), hard-proxy full two-stage.  Watchdogged; commits artifacts.
set -u
cd /root/repo
echo $$ > /tmp/r5recipes.pid
LOG=workspace/runs/r5_recipes.log
OUT=workspace/validation/round5
WD=workspace/ab/run_watchdog.sh
mkdir -p $OUT workspace/runs

step() {
  local name=$1 log=$2 stale=$3 tmo=$4; shift 5
  echo "=== $name start $(date)" >> $LOG
  timeout "$tmo" bash $WD "$log" "$stale" 2 -- "$@"
  local rc=$?
  echo "=== $name rc=$rc $(date)" >> $LOG
  git add -f "$log" $OUT 2>/dev/null
  git commit -q -m "round5 artifact: $name" 2>/dev/null || true
  return $rc
}

step sdf_chip $OUT/sdf_chip.log 20 10800 -- \
  python workspace/ab/sdf_chip_run.py

step colmap_chip $OUT/colmap_chip.log 20 9000 -- \
  python workspace/ab/colmap_chip_run.py

step hard_full $OUT/hard_full.log 25 14400 -- \
  python workspace/ab/hard_full_recipe.py

echo "=== r5 recipes queue done $(date)" >> $LOG
