#!/bin/bash
# Round-3 queue 8 (chained after tpu_queue7.sh): inverse-flow recovery
# on the contaminant channel — recover the Poiseuille peak speed from
# 300 sparse FDM concentration observations, jointly with the net
# (DESIGN.md decision 17).
set -u
cd /root/repo
LOG=/tmp/tpu_queue8
mkdir -p $LOG

for P in /tmp/tpu_queue7.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat $P)" 2>/dev/null; do sleep 30; done
  fi
done

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  [ -f "$LOG/$name.done" ] && { echo "skip $name (done)"; return; }
  echo "=== $name: $(date -u) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; fi
  echo "=== $name rc=$rc $(date -u) ==="
}

step inverse_flow 10800 python -u benchmarks/inverse_flow.py \
  --disc 32 --tdisc 20 --width 32 --layers 3 --epochs 12000 \
  --lm-steps 20 --lm-cg 150 --k-chunks 2 --folder /tmp/inverse_flow
echo "=== queue8 complete $(date -u) ==="
