#!/bin/bash
# Round-4 queue 20 — VERDICT r3 items on real TPU (chained behind
# queue19 by benchmarks/chain_after.sh; every step rides
# run_resumable.sh: bench preemption + hang retry + --resume).
#   1. obstacle_refine: targeted refine_tests continuation from
#      queue19's obstacle_dense checkpoints (VERDICT item 1 lever 3;
#      falls back to fresh Adam if that folder is gone)
#   2. hardbc 2-D steady A/B arm A — hard with DOUBLE LM budget (tests
#      the "LM polishes the unconstrained net further" hypothesis,
#      VERDICT item 4; penalty reference 2.90e-4 at 30 LM iters)
#   3. arm B — hard x order-2 test space (precoeff kernel composition)
#   4. time_to_target cold (records/improves the 15.1-min headline;
#      also exercises the undefined-variable fix in stage 2)
#   5. time_to_target --warm right after: the warm-cache row (VERDICT
#      item 7; ~/.cache/varnet_tpu_xla persists across reboots)
#   6. lm_precond 3-arm A/B at flagship shape: plain vs elementwise vs
#      per-leaf (VERDICT item 9; the leaf mode is the new default)
#   7-8. MOR mu-density sweep at n_mu = 7 and 13 per family (VERDICT
#      item 5: held-out-mu <= 5e-3 target; throughput is not the
#      constraint — the parametric fused kernel does 1.15e9 evals/s)
set -u
cd /root/repo
LOG=/tmp/tpu_queue20
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

step obstacle_refine 16000 benchmarks/run_resumable.sh 5000 3 \
  python -u benchmarks/obstacle_refine.py --from-folder /tmp/obstacle_dense \
  --disc 80 --tdisc 40 --width 48 --layers 2 --rounds 2 --frac 0.15 \
  --cont-epochs 4000 --lm-steps 15 --lm-cg 150 --k-chunks 8

# capacity x density TOGETHER (round-4 addition after obstacle_dense
# landed 39.8%: the d80/t40 mesh removed the aliasing — the int loss is
# honest at 8.9e-3 — but (48,)x2 UNDERFITS the rod-corner transient; the
# ff128/w96 capacity that aliased at d(40,20) gets the dense operator
# here.  residual_adequacy can audit the result post-hoc.)
step obstacle_ff_dense 16000 benchmarks/run_resumable.sh 5000 3 \
  python -u benchmarks/obstacle_validation.py --hard-bc --disc 80 \
  --tdisc 40 --width 96 --layers 3 --ff 128 --ff-scale 0.5,2.0 \
  --epochs 16000 --lm-steps 20 --lm-cg 150 --k-chunks 16 \
  --folder /tmp/obstacle_ff_dense

step tt_cold 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py

step tt_warm 6000 benchmarks/run_resumable.sh 2800 2 \
  python -u benchmarks/time_to_target.py --warm

step hardbc_2d_lm60 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 60 --lm-cg 200 --k-chunks 2 \
  --modes hard --folder /tmp/hardbc_q20

step hardbc_2d_o2 10000 benchmarks/run_resumable.sh 3500 3 \
  python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 --width 48 \
  --layers 2 --epochs 8000 --lm-steps 30 --lm-cg 200 --k-chunks 4 \
  --order 2 --modes hard --folder /tmp/hardbc_q20

step lm_precond_ab 8000 benchmarks/run_resumable.sh 3500 2 \
  python -u benchmarks/lm_precond_probe.py --tpu --disc 48 --tdisc 32 \
  --width 32 --epochs 8000 --lm-steps 8 --cg-iters 100 --k-chunks 4 \
  --out benchmarks/results/lm_precond_tpu.json

step mor_n7 8000 benchmarks/run_resumable.sh 3000 2 \
  python -u benchmarks/mor_accuracy.py --epochs 30000 --lm-steps 20 \
  --samples-1d 0.5,0.75,1.0,1.25,1.5,1.75,2.0 --key mor_1d_peclet_n7 \
  --samples-2d 0.5,0.75,1.0,1.25,1.5,1.75,2.0 \
  --key-2d mor_2d_boundary_layer_n7

step mor_n13 10000 benchmarks/run_resumable.sh 4000 2 \
  python -u benchmarks/mor_accuracy.py --epochs 30000 --lm-steps 20 \
  --samples-1d 0.5,0.625,0.75,0.875,1.0,1.125,1.25,1.375,1.5,1.625,1.75,1.875,2.0 \
  --key mor_1d_peclet_n13 \
  --samples-2d 0.5,0.625,0.75,0.875,1.0,1.125,1.25,1.375,1.5,1.625,1.75,1.875,2.0 \
  --key-2d mor_2d_boundary_layer_n13

echo "=== queue20 complete $(date -u) ==="
