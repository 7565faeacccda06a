#!/bin/bash
# Round-5 queue 3: post-v11 — sharp-without-shell ablation arm, then the
# three BASELINE recipes.  Waits for the v11 capstone (pid arg 1).
set -u
cd /root/repo
echo $$ > /tmp/r5q3.pid
LOG=workspace/runs/r5_main.log
OUT=workspace/validation/round5
WD=workspace/ab/run_watchdog.sh

if [ -n "${1:-}" ]; then
  echo "=== q3 waiting for pid $1 $(date)" >> $LOG
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

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

# ablation: same sharp ckpt + mesh, single-sample shading (prices the shell)
CAP11_SUFFIX=point CAP11_SHELL_K=1 CAP11_STOCH=0 \
  step cap_v11_point workspace/runs/r5capv11p.log 25 7200 -- \
  python workspace/ab/r5_capstone_v11.py

CAP_WS=/root/repo/workspace/runs/ws96v11 \
  step cap_diag_v11 $OUT/cap_diag_v11.log 18 3600 -- \
  python workspace/ab/cap_diag.py 3

step sdf_chip $OUT/sdf_chip.log 25 10800 -- \
  python workspace/ab/sdf_chip_run.py

step colmap_chip $OUT/colmap_chip.log 25 9000 -- \
  python workspace/ab/colmap_chip_run.py

step hard_full $OUT/hard_full.log 30 14400 -- \
  python workspace/ab/hard_full_recipe.py

echo "=== r5 queue3 done $(date)" >> $LOG
