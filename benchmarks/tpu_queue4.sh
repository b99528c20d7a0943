#!/bin/bash
# Round-3 queue 4: regression smoke for the _auto_tile_lm cap (flagship
# width 48 unchanged + the previously-OOMing 3-D width 64), then the
# retried deep 3-D disc-16 push that the cap unblocks.
set -u
cd /root/repo
LOG=/tmp/tpu_queue4
mkdir -p $LOG

# Never two TPU processes: wait for any earlier queue to release the chip.
for P in /tmp/tpu_queue3.pid; do
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

step lm_smoke 5400 python -u benchmarks/lm_smoke.py
step ad3d_d16_deep 10800 python -u benchmarks/ad3d_floor.py --disc 16 \
  --width 64 --layers 3 --epochs 30000 --lm-steps 60 --lm-cg 300 \
  --error-disc 32 --folder /tmp/ad3d_d16_deep
echo "=== queue4 complete $(date -u) ==="
