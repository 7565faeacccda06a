#!/bin/bash
# run_watchdog.sh <logfile> <stale_minutes> <max_restarts> -- <cmd...>
# Runs <cmd> redirecting to <logfile>; if the log goes stale for
# <stale_minutes> (axon relay hard-stall signature: process futex-waits,
# chip idle, zero CPU), kills the process tree and re-runs <cmd> (the
# nerf2mesh CLI resumes from --ckpt latest).  Exits with the cmd's rc.
set -u
LOG=$1; STALE_MIN=$2; MAXR=$3; shift 3
[ "$1" = "--" ] && shift
tries=0
while : ; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ -f "$LOG" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$age" -gt $(( STALE_MIN * 60 )) ]; then
        echo "[watchdog] log stale ${age}s — killing $PID and restarting" >> "$LOG"
        kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
        break
      fi
    fi
  done
  wait "$PID" 2>/dev/null; rc=$?
  # finished (log fresh) -> done; stale-kill -> restart up to MAXR
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -le $(( STALE_MIN * 60 )) ] && [ "$rc" -eq 0 ]; then
    exit 0
  fi
  tries=$(( tries + 1 ))
  if [ "$tries" -gt "$MAXR" ]; then
    echo "[watchdog] giving up after $tries restarts" >> "$LOG"
    exit 1
  fi
  echo "[watchdog] restart #$tries $(date -u)" >> "$LOG"
done
