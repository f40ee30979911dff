#!/bin/bash
# Retry wrapper for on-chip drives: fresh TPU processes intermittently
# wedge in the first device dispatch (futex wait). Run under a hard
# timeout; if the process produced no PROGRESS line, sleep and relaunch.
#   usage: chip_run.sh <logfile> <timeout_s> <cmd...>
LOG=$1; TMO=$2; shift 2
for attempt in 1 2 3 4; do
  echo "=== attempt $attempt: $* ===" >> "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "=== OK (attempt $attempt)" >> "$LOG"; exit 0; fi
  echo "=== rc=$rc (attempt $attempt)" >> "$LOG"
  sleep 60
done
exit 1
