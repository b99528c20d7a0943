#!/bin/bash
# Round-3 queue 9 (chained after the run_queues2 chain): hard-BC TPU A/Bs
# on HONEST cases (G is not the solution — see benchmarks/hardbc_tpu.py).
# Step 1: 2-D manufactured steady (zero Dirichlet, G = 0).
# Step 2: 3-D steady at the measured penalty reference point (2.24e-3
#         at disc 12 / width 64, 123 s — ad3d_floor.json).
# Step 3: 1-D transient erfc front at production budget.
set -u
cd /root/repo
LOG=/tmp/tpu_queue9
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

step hardbc_2d 5400 python -u benchmarks/hardbc_tpu.py --case 2d \
  --disc 48 --width 48 --layers 2 --epochs 8000 --lm-steps 30 \
  --lm-cg 200 --folder /tmp/hardbc_2d
step hardbc_3d 7200 python -u benchmarks/hardbc_tpu.py --case 3d \
  --disc 12 --width 64 --layers 2 --epochs 8000 --lm-steps 40 \
  --lm-cg 120 --folder /tmp/hardbc_3d
step hardbc_1dt 5400 python -u benchmarks/hardbc_tpu.py --case 1dt \
  --disc 48 --tdisc 32 --width 32 --layers 3 --epochs 8000 \
  --lm-steps 30 --lm-cg 200 --folder /tmp/hardbc_1dt
echo "=== queue9 complete $(date -u) ==="
