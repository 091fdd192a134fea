#!/bin/bash
# Auto-restarting trainer for flaky-tunnel conditions: the axon TPU
# tunnel intermittently wedges a client mid-dispatch (futex wait, zero
# CPU, forever). Training checkpoints per epoch and resumes, so the
# cheapest robust fix is supervision: restart the trainer whenever its
# log goes quiet for STALL_S seconds. Exits when the trainer completes
# (exit 0) or MAX_RESTARTS is hit.
set -u
LOG=${LOG:-/tmp/train_watchdog.log}
STALL_S=${STALL_S:-420}
MAX_RESTARTS=${MAX_RESTARTS:-60}
CMD=("$@")
restarts=0
while true; do
  : > "$LOG"
  PYTHONFAULTHANDLER=1 "${CMD[@]}" >> "$LOG" 2>&1 &
  pid=$!
  echo "[watchdog] attempt $restarts pid $pid $(date +%H:%M:%S)" >> "$LOG.meta"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "[watchdog] stall (${age}s quiet) — killing $pid $(date +%H:%M:%S)" >> "$LOG.meta"
      kill -9 "$pid" 2>/dev/null
      sleep 3
      break
    fi
  done
  if ! kill -0 "$pid" 2>/dev/null; then
    wait "$pid"; rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[watchdog] trainer completed ok $(date +%H:%M:%S)" >> "$LOG.meta"
      exit 0
    fi
    echo "[watchdog] trainer exited rc=$rc $(date +%H:%M:%S)" >> "$LOG.meta"
  fi
  restarts=$((restarts+1))
  if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
    echo "[watchdog] giving up after $restarts restarts" >> "$LOG.meta"
    exit 1
  fi
done
