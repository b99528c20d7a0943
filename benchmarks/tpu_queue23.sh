#!/bin/bash
# Round-5 queue 23 — replaces queue22 after its first step twice hit the
# 2300 s attempt budget ~80 s before scoring (the LM continuation itself
# WORKED: 39.8% -> 12.87% by iter 80, loss still descending).  Same
# priority logic, budgets sized to what the first step measured
# (~19.2 s/LM-iter at d80/t40 w48 k_chunks=8).
set -u
cd /root/repo
LOG=/tmp/tpu_queue23
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

# 1-3. the r3 closures FIRST (certain, binary-checkable)
step tt_cold 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py

step tt_warm 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py --warm

step lm_precond_ab 8000 benchmarks/run_resumable.sh 3500 2 \
  python -u benchmarks/lm_precond_probe.py --tpu --disc 48 --tdisc 32 \
  --width 32 --epochs 8000 --lm-steps 8 --cg-iters 100 --k-chunks 4 \
  --out benchmarks/results/lm_precond_tpu.json

# 4b. the hot hand (its 9.91% row is already banked via the CPU rescore): +150 LM iters from the newest dense-LM
#    checkpoints, single WIDE attempt so the score always lands
W1=/tmp/obstacle_lmcont2/r0
[ -d "$W1/lm" ] || W1=/tmp/obstacle_lmcont/r0
step obstacle_lmcont2 5200 benchmarks/run_resumable.sh 5000 2 \
  python -u benchmarks/obstacle_refine.py \
  --from-folder "$W1" \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 0 \
  --cont-epochs 0 --lm-steps 60 --lm-cg 200 --k-chunks 8 \
  --folder /tmp/obstacle_lmcont2

# 5. the untried curriculum lever (coarse mesh, cheap)
step obstacle_causal 9000 benchmarks/run_resumable.sh 4200 2 \
  python -u benchmarks/obstacle_causal.py --disc 40 --tdisc 24 \
  --width 48 --layers 2 --epochs 8000 --windows 0.125,0.25,0.5,1.0 \
  --lm-steps 30 --lm-cg 150 --k-chunks 4 --folder /tmp/obstacle_causal

# 6-7. closures (first arms)
# (1-D mu-density arms landed on CPU during the tunnel outage:
#  n7 / n13 / cheb / w48 / long -- the long-budget recipe closes the
#  <=5e-3 holdout bar; TPU steps now run the 2-D family only)
step mor_n7 8000 benchmarks/run_resumable.sh 3000 2 \
  python -u benchmarks/mor_accuracy.py --only 2d --epochs 30000 --lm-steps 20 \
  --samples-2d 0.5,0.75,1.0,1.25,1.5,1.75,2.0 \
  --key-2d mor_2d_boundary_layer_n7

step hardbc_2d_lm60 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 60 --lm-cg 200 --k-chunks 2 \
  --modes hard --folder /tmp/hardbc_q20

# 8. refined-space straight-LM continuation from the best dense theta
#    (the round-4 refine NEGATIVE retried the RIGHT way: preserved
#    iterate, no Adam restart)
WARM=/tmp/obstacle_lmcont2/r0
[ -d "$WARM/lm" ] || WARM=/tmp/obstacle_lmcont/r0
step obstacle_lmrefine 9000 benchmarks/run_resumable.sh 4500 2 \
  python -u benchmarks/obstacle_refine.py --from-folder "$WARM" \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 1 --frac 0.15 \
  --cont-epochs 0 --lm-steps 60 --lm-cg 200 --k-chunks 16 \
  --skip-polish --folder /tmp/obstacle_lmrefine

# 9-10. second arms
step mor_n13 10000 benchmarks/run_resumable.sh 4000 2 \
  python -u benchmarks/mor_accuracy.py --only 2d --epochs 60000 --lm-steps 40 \
  --samples-2d 0.5,0.625,0.75,0.875,1.0,1.125,1.25,1.375,1.5,1.625,1.75,1.875,2.0 \
  --key-2d mor_2d_boundary_layer_n13_long

step hardbc_2d_o2 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 30 --lm-cg 200 --k-chunks 4 \
  --order 2 --modes hard --folder /tmp/hardbc_q20

# 11. longest gamble last
step obstacle_ff_dense 16000 benchmarks/run_resumable.sh 5000 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --disc 80 \
  --tdisc 40 --width 96 --layers 3 --ff 128 --ff-scale 0.5,2.0 \
  --epochs 16000 --lm-steps 20 --lm-cg 150 --k-chunks 16 \
  --folder /tmp/obstacle_ff_dense

echo "=== queue23 complete $(date -u) ==="
