#!/bin/bash
# Round-4 session-3 chip queue: encode-fix validation -> bench -> capstone-v5
# (snap-v2) -> v5 diagnostic.  Appends to workspace/runs/r4_seq2.log.
# Stop with: kill $(cat /tmp/r4seq2.pid)
cd /root/repo
LOG=workspace/runs/r4_seq2.log

echo "=== r4_encode_fix_bench $(date)" >> $LOG
timeout 3600 python workspace/ab/r4_encode_fix_bench.py >> $LOG 2>&1

echo "=== bench.py $(date)" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1

echo "=== capstone-v5 (snap-v2) $(date)" >> $LOG
timeout 9000 python workspace/ab/r4_capstone_v5.py \
  > workspace/runs/r4capv5.log 2>&1
echo "=== capstone-v5 done rc=$? $(date)" >> $LOG

echo "=== cap_diag ws96v5 $(date)" >> $LOG
CAP_WS=/root/repo/workspace/runs/ws96v5 timeout 3600 \
  python workspace/ab/cap_diag.py 2 > workspace/runs/cap_diag_v5.log 2>&1

echo "=== queue done $(date)" >> $LOG
