#!/bin/bash
# tools/probe_guard.sh <logfile> <MainClass> [args...]
# Runs tools/probe.sh under a disk guard: if / falls below 8 GB free the
# probe JVM is killed and its leftover /tmp/blockmgr-* scratch removed —
# a scratch-death leg must not take the box with it (round-14 lesson: one
# killed e18 leg left 62 GB of blockmgr files behind).
set -u
LOG="$1"; shift
"$(dirname "$0")/probe.sh" "$@" > "$LOG" 2>&1 &
PID=$!
while kill -0 "$PID" 2>/dev/null; do
  sleep 20
  AV=$(df --output=avail / | tail -1)
  if [ "$AV" -lt 8000000 ]; then
    echo "[probe-guard] disk low (${AV}KB) — killing $PID" | tee -a "$LOG"
    kill -9 "$PID"
    sleep 2
    break
  fi
done
wait "$PID" 2>/dev/null; RC=$?
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]*-* 2>/dev/null
echo "[probe-guard] exit=$RC avail_after=$(df -h --output=avail / | tail -1 | tr -d ' ')" >> "$LOG"
exit 0
