#!/bin/bash
# chain_after.sh SENTINEL_LOG NEXT_QUEUE.sh — wait until SENTINEL_LOG
# contains a "queueNN complete" line, then run NEXT_QUEUE.sh.  Keeps the
# one-TPU-process-at-a-time invariant across chained queues (CLAUDE.md).
# Survives only until the next reboot; after a reboot re-launch both the
# interrupted queue and this waiter (each queue's per-step .done markers
# live in /tmp and are also wiped — re-touch the harvested ones first).
set -u
sentinel=$1; next=$2
# anchored: only the queue driver's own final line matches (a step name
# or log line merely containing "complete" must not fire the chain)
while ! grep -q "^=== queue[0-9]* complete" "$sentinel" 2>/dev/null; do
  sleep 120
done
exec bash "$next"
