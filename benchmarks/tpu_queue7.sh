#!/bin/bash
# Round-3 queue 7 (chained after tpu_queue6.sh): viscous-Burgers TPU
# accuracy — the first on-chip numbers for the nonlinear-advection
# family (DESIGN.md decision 16).  Step 1: tanh traveling front
# (disc 48/tdisc 32).  Step 2: steady standing shock (LM pins the
# weakly-determined front position).
set -u
cd /root/repo
LOG=/tmp/tpu_queue7
mkdir -p $LOG

for P in /tmp/tpu_queue6.pid; do
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

step burgers_front 7200 python -u benchmarks/burgers_accuracy.py \
  --disc 48 --tdisc 32 --width 32 --layers 3 --epochs 12000 \
  --lm-steps 40 --lm-cg 200 --folder /tmp/burgers_front
step burgers_shock 3600 python -u benchmarks/burgers_accuracy.py \
  --steady --nu 0.07 --disc 64 --width 32 --layers 3 --epochs 8000 \
  --lm-steps 30 --lm-cg 200 --folder /tmp/burgers_shock
step burgers_2d 7200 python -u benchmarks/burgers_accuracy.py \
  --two-d --nu 0.1 --disc 32 --tdisc 20 --width 32 --layers 3 \
  --epochs 12000 --lm-steps 40 --lm-cg 200 --k-chunks 2 \
  --folder /tmp/burgers_2d
echo "=== queue7 complete $(date -u) ==="
