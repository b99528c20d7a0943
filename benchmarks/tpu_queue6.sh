#!/bin/bash
# Round-3 queue 6 (chained after tpu_queue5.sh): 3-D TRANSIENT floors —
# the first TPU numbers for 4-D space-time test functions (nQ = (2q)^4,
# the deepest stress of the tensor-product quadrature machinery).
# Step 1: small mesh (disc 8 / tdisc 6, ~0.5M quad pts) at width 48.
# Step 2: flagship-scale mesh (disc 12 / tdisc 8, ~2.7M quad pts) at
# width 64 with the deep-LM budget that took 3-D steady d16 to 4.48e-4.
set -u
cd /root/repo
LOG=/tmp/tpu_queue6
mkdir -p $LOG

for P in /tmp/tpu_queue5.pid; do
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

step ad3dt_d8 7200 python -u benchmarks/ad3d_floor.py --transient \
  --disc 8 --tdisc 6 --width 48 --layers 2 --epochs 12000 \
  --lm-steps 40 --lm-cg 150 --error-disc 16 --error-times 5 \
  --folder /tmp/ad3dt_d8
step ad3dt_d12 10800 python -u benchmarks/ad3d_floor.py --transient \
  --disc 12 --tdisc 8 --width 64 --layers 2 --epochs 20000 \
  --lm-steps 50 --lm-cg 200 --error-disc 16 --error-times 5 \
  --folder /tmp/ad3dt_d12
echo "=== queue6 complete $(date -u) ==="
