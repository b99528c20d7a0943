#!/bin/bash
# Round-5 queue 22 — reprioritized takeover of queue20/21 (the round-4
# queue died mid-obstacle_refine on a diagnosed continuation-LR bug; see
# obstacle_validation.json "hard+refine" NEGATIVE row).  Order: cheap
# obstacle levers + the four r3 closures FIRST (VERDICT items 1+2), the
# long gambles last so a round-end cutoff costs the least.
#   1. obstacle_lmcont: straight-LM continuation of the 39.8% dense run
#      (LM was descending ~2e-4/iter at budget end; NO Adam restart)
#   2-3. time_to_target cold + warm (r3 closure a)
#   4. lm_precond 3-arm TPU A/B (r3 closure c — validates or reverts
#      the per-leaf default changed on CPU evidence)
#   5. obstacle_causal: growing-window curriculum at the coarse mesh
#      (the untried lever; early-time error dominates every arm)
#   6. coarse2dense: continuation of the causal theta against the DENSE
#      d80/t40 operator at low LR (rounds=0 polish)
#   7-8. mor_n7 + hardbc_2d_lm60 (r3 closures d+b)
#   9-10. mor_n13 + hardbc_2d_o2
#   11. obstacle_ff_dense: capacity x density (longest gamble, last)
set -u
cd /root/repo
LOG=/tmp/tpu_queue22
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

step obstacle_lmcont 5000 benchmarks/run_resumable.sh 2300 2 \
  python -u benchmarks/obstacle_refine.py --from-folder /tmp/obstacle_dense \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 0 \
  --cont-epochs 0 --lm-steps 100 --lm-cg 200 --k-chunks 8 \
  --folder /tmp/obstacle_lmcont

step tt_cold 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py

step tt_warm 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py --warm

step lm_precond_ab 8000 benchmarks/run_resumable.sh 3500 2 \
  python -u benchmarks/lm_precond_probe.py --tpu --disc 48 --tdisc 32 \
  --width 32 --epochs 8000 --lm-steps 8 --cg-iters 100 --k-chunks 4 \
  --out benchmarks/results/lm_precond_tpu.json

step obstacle_causal 9000 benchmarks/run_resumable.sh 4200 2 \
  python -u benchmarks/obstacle_causal.py --disc 40 --tdisc 24 \
  --width 48 --layers 2 --epochs 8000 --windows 0.125,0.25,0.5,1.0 \
  --lm-steps 30 --lm-cg 150 --k-chunks 4 --folder /tmp/obstacle_causal

WARM=/tmp/obstacle_causal_full
[ -d "$WARM/lm" ] || WARM=/tmp/obstacle_dense
step coarse2dense 9000 benchmarks/run_resumable.sh 4200 2 \
  python -u benchmarks/obstacle_refine.py --from-folder "$WARM" \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 0 \
  --cont-epochs 2000 --cont-lr 2e-4 --lm-steps 60 --lm-cg 200 \
  --k-chunks 8 --folder /tmp/coarse2dense

step mor_n7 8000 benchmarks/run_resumable.sh 3000 2 \
  python -u benchmarks/mor_accuracy.py --epochs 30000 --lm-steps 20 \
  --samples-1d 0.5,0.75,1.0,1.25,1.5,1.75,2.0 --key mor_1d_peclet_n7 \
  --samples-2d 0.5,0.75,1.0,1.25,1.5,1.75,2.0 \
  --key-2d mor_2d_boundary_layer_n7

step hardbc_2d_lm60 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 60 --lm-cg 200 --k-chunks 2 \
  --modes hard --folder /tmp/hardbc_q20

step mor_n13 10000 benchmarks/run_resumable.sh 4000 2 \
  python -u benchmarks/mor_accuracy.py --epochs 30000 --lm-steps 20 \
  --samples-1d 0.5,0.625,0.75,0.875,1.0,1.125,1.25,1.375,1.5,1.625,1.75,1.875,2.0 \
  --key mor_1d_peclet_n13 \
  --samples-2d 0.5,0.625,0.75,0.875,1.0,1.125,1.25,1.375,1.5,1.625,1.75,1.875,2.0 \
  --key-2d mor_2d_boundary_layer_n13

step hardbc_2d_o2 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 30 --lm-cg 200 --k-chunks 4 \
  --order 2 --modes hard --folder /tmp/hardbc_q20

step obstacle_ff_dense 16000 benchmarks/run_resumable.sh 5000 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --disc 80 \
  --tdisc 40 --width 96 --layers 3 --ff 128 --ff-scale 0.5,2.0 \
  --epochs 16000 --lm-steps 20 --lm-cg 150 --k-chunks 16 \
  --folder /tmp/obstacle_ff_dense

echo "=== queue22 complete $(date -u) ==="
