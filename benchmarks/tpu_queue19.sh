#!/bin/bash
# Round-3 queue 19 — order-2 auto-selection follow-ups (chained behind
# queue18 by benchmarks/chain_after.sh; one TPU process at a time):
#   1. order2_auto: short order-2 run WITHOUT --precoeff — validates that
#      the new api auto-selection (commit dfb1a70) engages the precoeff
#      fused kernel on the real device (Adam wall should match the
#      measured 124M evals/s precoeff rate, not the 54M value+jac one;
#      A/B rows land in order2_floor.json).
#   2. 2d_steady at order 2: the order-1 pin (1.34e-4, theta_2d_steady)
#      sits near its 0.21 h^2 mesh floor (disc 48 -> ~9.1e-5); the
#      order-2 O(h^3) floor is far lower.  Shared theta file — the
#      improve-only guard keeps whichever solution re-scores best.
#   3. 1d_steady at order 2: pin 6.9e-4 at disc 64 (floor 5.1e-5) —
#      same bet.  Width stays the CONFIGS value so pin re-score works.
set -u
cd /root/repo
LOG=/tmp/tpu_queue19
mkdir -p $LOG

step() {  # step NAME TIMEOUT CMD...  — every step rides run_resumable.sh
          # (bench preemption + hang retry + --resume; ADVICE r3 medium)
  local name=$1 tmo=$2; shift 2
  [ -f "$LOG/$name.done" ] && { echo "skip $name (done)"; return; }
  echo "=== $name: $(date -u) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; fi
  echo "=== $name rc=$rc $(date -u) ==="
}

step order2_auto 5000 benchmarks/run_resumable.sh 2500 2 \
  python -u benchmarks/order2_floor.py --order 2 --disc 16 --tdisc 12 \
  --width 48 --layers 3 --epochs 2000 --lm-steps 0 --k-chunks 1 \
  --folder /tmp/o2auto

step per2d_o2 12000 benchmarks/run_resumable.sh 4000 3 \
  python -u benchmarks/per_config_accuracy.py --only 2d_steady --order 2 \
  --epochs 12000 --lm-steps 60 --lm-cg 150 --k-chunks 8

step per1d_o2 9000 benchmarks/run_resumable.sh 3000 3 \
  python -u benchmarks/per_config_accuracy.py --only 1d_steady --order 2 \
  --epochs 10000 --lm-steps 60 --lm-cg 100 --k-chunks 4

# Obstacle frontier, redirected by the queue18 step-3 diagnosis (int
# residual fell 1000x while rel-L2 rose to 88%: the weak residual at
# d(40,20)/t24 underdetermines the FF-rich space).  Attack the residual
# operator, not capacity:
#   4. DENSER TEST MESH at the proven w48 hard recipe (4x classes, 2x
#      quad density per dim — does 13.3% drop when the operator sees
#      the oscillations?)
#   5. capacity WITHOUT the aliasing-prone Fourier basis (w96 plain)
step obstacle_dense 12000 benchmarks/run_resumable.sh 4000 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --disc 80 \
  --tdisc 40 --width 48 --layers 2 --epochs 16000 --lm-steps 20 \
  --lm-cg 150 --k-chunks 8 --folder /tmp/obstacle_dense

step obstacle_w96 12000 benchmarks/run_resumable.sh 4000 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --width 96 \
  --layers 3 --epochs 16000 --lm-steps 20 --lm-cg 150 --k-chunks 2 \
  --folder /tmp/obstacle_w96

echo "=== queue19 complete $(date -u) ==="
