#!/bin/bash
# Round-3 tail TPU queue (chained after tpu_queue2.sh): the causal
# contaminant LM polish that was skipped by hand last round, a deeper
# 3-D push (d16/width-64 landed 2.5e-3 optimization-bound in ~2 min —
# plenty of budget headroom), and the ad3d_steady example CLI smoke.
set -u
cd /root/repo
LOG=/tmp/tpu_queue3
mkdir -p $LOG

# Wait for tpu_queue2 to release the chip (never two TPU processes).
if [ -f /tmp/tpu_queue2.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue2.pid)" 2>/dev/null; do sleep 30; done
fi

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  [ -f "$LOG/$name.done" ] && { echo "skip $name (done)"; return; }
  echo "=== $name: $(date -u) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; fi
  echo "=== $name rc=$rc $(date -u) ==="
}

step causal_lm 10800 benchmarks/run_resumable.sh 3600 3 \
  python -u benchmarks/contaminant_causal_lm.py
step ad3d_d16_deep 7200 python -u benchmarks/ad3d_floor.py --disc 16 \
  --width 64 --layers 3 --epochs 30000 --lm-steps 60 --lm-cg 300 \
  --error-disc 32 --folder /tmp/ad3d_d16_deep
step ad3d_example 3600 python -m varnet_tpu.examples.ad3d_steady \
  --epochs 2000 --save-freq 1000 --folder /tmp/ad3d_example --devices 1
echo "=== queue3 complete $(date -u) ==="
