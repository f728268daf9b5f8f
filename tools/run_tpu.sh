#!/bin/bash
# Resilient TPU job runner for the flaky axon claim path: starts the
# command, watches for progress, kills and retries on stall.
#
# Two stall detectors:
#  - log growth (threshold $STALL seconds) — covers long device hangs
#  - claim-stuck: no log growth AND process cpu-time < 30s after 300s
#    (a wedged chip claim burns no CPU; retrying promptly usually works)
#
# Usage: run_tpu.sh <logfile> <progress-timeout-s> <max-tries> <cmd...>
LOG=$1; STALL=$2; TRIES=$3; shift 3

for attempt in $(seq 1 "$TRIES"); do
  echo "[run_tpu] attempt $attempt: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 < /dev/null &
  PID=$!
  start=$(date +%s)
  last_size=$(stat -c %s "$LOG")
  last_change=$start
  while kill -0 $PID 2>/dev/null; do
    sleep 10
    size=$(stat -c %s "$LOG")
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
      continue
    fi
    cpu=$(awk '{print int(($14+$15)/100)}' /proc/$PID/stat 2>/dev/null)
    # NOTE: remote compiles also idle the client; they accrue >15s cpu
    # from tracing first, so the threshold stays conservative
    if [ $((now - start)) -gt 420 ] && [ "${cpu:-99}" -lt 12 ] \
       && [ $((now - last_change)) -gt 420 ]; then
      echo "[run_tpu] claim-stuck (cpu ${cpu}s), killing pid $PID" >> "$LOG"
      kill -9 -$PID 2>/dev/null
      sleep 5
      break
    fi
    if [ $((now - last_change)) -gt "$STALL" ]; then
      echo "[run_tpu] stalled ${STALL}s, killing pid $PID" >> "$LOG"
      kill -9 -$PID 2>/dev/null
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
