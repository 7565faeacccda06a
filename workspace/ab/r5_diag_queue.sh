#!/bin/bash
# Round-5 diagnosis queue: cap_diag on the v9 capstone (VERDICT r4 task 3a).
# Commits its own artifacts (VERDICT r4 weak #9: evidence died with the
# container twice; commit at generation time).
set -u
cd /root/repo
OUT=workspace/validation/round5
mkdir -p $OUT

echo "== cap_diag_v9 (snap-reconstructed) ==" | tee $OUT/cap_diag_v9.log
CAP_WS=/root/repo/workspace/runs/ws96v9 CAP_SNAP=1 CAP_REFINE=0 \
  timeout 3600 python workspace/ab/cap_diag.py 4 2>&1 \
  | tee -a $OUT/cap_diag_v9.log

git add $OUT/cap_diag_v9.log
git commit -q -m "round5: cap_diag_v9 train/val estimator-vs-generalization decomposition" || true
echo "QUEUE DONE"
