#!/bin/bash
# Round-3 queue 10 (chained after queue9): hard-BC on the contaminant
# INLET validation (exact inlet/walls/IC; outlet free) vs the measured
# 3.2% penalty result — same shipped CN-FDM reference data; and the next
# 3-D transient floor point (d16) if time remains.
set -u
cd /root/repo
LOG=/tmp/tpu_queue10
mkdir -p $LOG

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  [ -f "$LOG/$name.done" ] && { echo "skip $name (done)"; return; }
  echo "=== $name: $(date -u) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; fi
  echo "=== $name rc=$rc $(date -u) ==="
}

step contaminant_inlet_hard 7200 python -u benchmarks/contaminant_validation.py \
  --variant inlet --hard-bc --train --score --epochs 24000 \
  --lm-steps 10 --lm-cg 150 --folder /tmp/contaminant_inlet_hard
step ad3dt_d16 10800 python -u benchmarks/ad3d_floor.py --transient \
  --disc 16 --tdisc 10 --width 64 --layers 2 --epochs 24000 \
  --lm-steps 50 --lm-cg 200 --error-disc 16 --error-times 5 \
  --k-chunks 4 --folder /tmp/ad3dt_d16
echo "=== queue10 complete $(date -u) ==="
