#!/bin/bash
# Round-4 queue 21 — obstacle frontier follow-ups (chained behind
# queue20 by benchmarks/chain_after.sh; every step rides
# run_resumable.sh: bench preemption + hang retry + --resume).
#
# Context (obstacle_validation.json): coarse w48 13.3%, w96 plain 22.4%,
# ff128/w96 coarse 88% ALIASED, w48 dense d80/t40 39.8% but clearly
# optimization-bound (LM still descending fast at budget end: loss
# 8.7e-3 -> 4.8e-3 over 20 iters at only ~15 s/iter).  The levers:
#   1. obstacle_deeplm: keep polishing the (refined) w48 dense run —
#      2 more refine_tests rounds with DEEP LM (60 iters/round).
#      Warm-starts from queue20's /tmp/obstacle_refine LM checkpoints
#      (falls back to /tmp/obstacle_dense, else fresh).
#   2. obstacle_ff_deeplm: same continuation treatment for the
#      capacity-x-density arm (queue20 obstacle_ff_dense checkpoints;
#      obstacle_refine.py --ff keeps the net shape compatible).
#   3. obstacle_t80: TIME density — every arm's per-time error peaks at
#      early times (0.77 @ t=0.2 vs 0.26 @ t=1.0 on w48 dense): the rod
#      heat-up transient may be under-resolved at tdisc 40.  ff128/w96
#      at d80/t80.
set -u
cd /root/repo
LOG=/tmp/tpu_queue21
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

WARM=/tmp/obstacle_refine
[ -d "$WARM/lm" ] || WARM=/tmp/obstacle_dense
step obstacle_deeplm 16000 benchmarks/run_resumable.sh 5200 3 \
  python -u benchmarks/obstacle_refine.py --from-folder "$WARM" \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 2 --frac 0.10 \
  --cont-epochs 2000 --lm-steps 60 --lm-cg 200 --k-chunks 8 \
  --folder /tmp/obstacle_deeplm

step obstacle_ff_deeplm 16000 benchmarks/run_resumable.sh 5200 3 \
  python -u benchmarks/obstacle_refine.py \
  --from-folder /tmp/obstacle_ff_dense \
  --disc 80 --tdisc 40 --width 96 --layers 3 --ff 128 \
  --ff-scale 0.5,2.0 --rounds 2 --frac 0.10 \
  --cont-epochs 2000 --lm-steps 40 --lm-cg 200 --k-chunks 16 \
  --folder /tmp/obstacle_ff_deeplm

step obstacle_t80 16000 benchmarks/run_resumable.sh 5200 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --disc 80 \
  --tdisc 80 --width 96 --layers 3 --ff 128 --ff-scale 0.5,2.0 \
  --epochs 16000 --lm-steps 20 --lm-cg 150 --k-chunks 32 \
  --folder /tmp/obstacle_t80

echo "=== queue21 complete $(date -u) ==="
