#!/bin/bash
# Round-4 night queue: waits for the recipes queue, then runs capstone-v6
# (snap-v2 + refine-cap + min_f padding, 3000 iters) + its diagnostic +
# layout ablation.  Stop with: kill $(cat /tmp/r4night.pid)
cd /root/repo
LOG=workspace/runs/r4_night.log

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

if [ -f /tmp/r4recipes.pid ]; then
  echo "=== waiting for recipes queue ($(cat /tmp/r4recipes.pid))" >> $LOG
  wait_pid "$(cat /tmp/r4recipes.pid)"
fi

echo "=== capstone-v6 $(date)" >> $LOG
timeout 14400 python workspace/ab/r4_capstone_v6.py \
  > workspace/runs/r4capv6.log 2>&1
echo "=== capstone-v6 rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v6 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v6 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v6.log 2>&1

echo "=== layout_ab $(date)" >> $LOG
timeout 7200 python workspace/ab/layout_ab.py \
  > workspace/runs/layout_ab.log 2>&1
echo "=== layout_ab rc=$? $(date)" >> $LOG

echo "=== night queue done $(date)" >> $LOG
