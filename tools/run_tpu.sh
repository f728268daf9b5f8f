#!/bin/bash
# Resilient TPU job runner for the flaky axon claim path: starts the
# command, watches for progress (log growth), kills and retries on stall.
# Usage: run_tpu.sh <logfile> <progress-timeout-s> <max-tries> <cmd...>
LOG=$1; STALL=$2; TRIES=$3; shift 3

for attempt in $(seq 1 "$TRIES"); do
  echo "[run_tpu] attempt $attempt: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 < /dev/null &
  PID=$!
  last_size=$(stat -c %s "$LOG")
  last_change=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 10
    size=$(stat -c %s "$LOG")
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
    elif [ $((now - last_change)) -gt "$STALL" ]; then
      echo "[run_tpu] stalled ${STALL}s, killing pid $PID" >> "$LOG"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[run_tpu] success on attempt $attempt" >> "$LOG"
    exit 0
  fi
  echo "[run_tpu] attempt $attempt exited rc=$rc; retrying" >> "$LOG"
  sleep 10
done
echo "[run_tpu] all attempts failed" >> "$LOG"
exit 1
