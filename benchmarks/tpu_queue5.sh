#!/bin/bash
# Round-3 queue 5 (chained after tpu_queue4.sh): order-2 flagship-floor
# attack.  The d16 order-2 number (8.7e-4, order2_floor.json) sits far
# above its O(h^3) test-space floor while order-1 d16 (1.15e-3) sits AT
# its 0.21 h^2 floor (8.2e-4) — i.e. the order-2 run was optimization-
# bound.  Step 1 doubles the LM budget at d16; step 2 tries d24/t16,
# which could undercut the order-1 disc-64 flagship floor (1.081e-4).
set -u
cd /root/repo
LOG=/tmp/tpu_queue5
mkdir -p $LOG

for P in /tmp/tpu_queue4.pid; do
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

step order2_d16_deep 7200 python -u benchmarks/order2_floor.py --order 2 \
  --disc 16 --tdisc 12 --epochs 16000 --lm-steps 60 --lm-cg 300 \
  --folder /tmp/order2_d16_deep
step order2_d24 14400 python -u benchmarks/order2_floor.py --order 2 \
  --disc 24 --tdisc 16 --epochs 16000 --lm-steps 50 --lm-cg 300 \
  --k-chunks 4 --folder /tmp/order2_d24
echo "=== queue5 complete $(date -u) ==="
