#!/bin/bash
# Round-4 sequential chip queue: runs after capstone-v3 (waits on its PID).
# Each stage appends to workspace/runs/r4_seq.log; PID recorded so it can be
# stopped with kill $(cat /tmp/r4seq.pid).
cd /root/repo
LOG=workspace/runs/r4_seq.log

wait_pid() {
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
}

if [ -f /tmp/capv3.pid ]; then
  echo "=== waiting for capstone-v3 ($(cat /tmp/capv3.pid))" >> $LOG
  wait_pid "$(cat /tmp/capv3.pid)"
fi

echo "=== r4_perf_probe $(date)" >> $LOG
timeout 3600 python workspace/ab/r4_perf_probe.py >> $LOG 2>&1

echo "=== bench default (stochastic, + stage1 steps/sec) $(date)" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1

echo "=== sdf_chip_run $(date)" >> $LOG
timeout 14400 python workspace/ab/sdf_chip_run.py >> $LOG 2>&1

echo "=== colmap_chip_run $(date)" >> $LOG
timeout 10800 python workspace/ab/colmap_chip_run.py >> $LOG 2>&1

echo "=== queue done $(date)" >> $LOG
