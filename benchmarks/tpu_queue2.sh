#!/bin/bash
# Round-3 follow-up TPU queue: the two jobs that failed before the
# JVP-tiler / ensemble fixes (commit 12698f9), re-run serially.
# Logs to /tmp/tpu_queue2/, .done markers make it re-runnable.
set -u
cd /root/repo
LOG=/tmp/tpu_queue2
mkdir -p $LOG

step() {  # step NAME CMD...
  local name=$1; shift
  [ -f "$LOG/$name.done" ] && { echo "skip $name (done)"; return; }
  echo "=== $name: $(date -u) ==="
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; fi
  echo "=== $name rc=$rc $(date -u) ==="
}

step ad3d_d12 python -u benchmarks/ad3d_floor.py --disc 12 --width 64 \
  --epochs 8000 --lm-steps 40 --lm-cg 120 --folder /tmp/ad3d_d12_w64
step ad3d_d16 python -u benchmarks/ad3d_floor.py --disc 16 --width 64 \
  --epochs 8000 --lm-steps 40 --lm-cg 120 --folder /tmp/ad3d_d16_w64
step ens_fused python -u benchmarks/ensemble_bench.py --tpu \
  --disc 48 --tdisc 32 --epochs 300 --members 2 4 8
step ens_xla python -u benchmarks/ensemble_bench.py --tpu --xla \
  --batch-num 16 --disc 48 --tdisc 32 --epochs 300 --members 2 4 8
echo "=== queue2 complete $(date -u) ==="
