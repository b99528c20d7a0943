#!/bin/bash
# Round-3 queue 18 — reconstruction of the /tmp-resident chain18 lost to
# the 2026-08-20 machine reboot, plus the two retries it had queued:
#   1. hardbc_3dt retry (first hard-BC 3-D transient number; the 4th
#      scoped-VMEM OOM is fixed by _vjp_budget, commit a7a7041)
#   2. +12 causal-contaminant LM iters (current best 1.63%; the polish
#      CLI only overwrites JSON/theta on improvement)
#   3. obstacle heated-rod frontier: hard BC x ff128 x width 96 (the
#      13.3% plateau at w48 looks representation-bound; contaminant
#      escape recipe)
#   4. flagship w96x3 from-scratch capacity study (--persist ->
#      flagship_theta_w96x3.npz + flagship_width.json row)
#   5. w96 push at d64/t40 (can the wider net undercut 1.081e-4?)
#   6. pinned w48 theta LM'd at d96/t56 (mesh-vs-representation bound
#      A/B vs the same theta's 1.081e-4 at d64/t40)
# Steps are independent except 5 (needs 4's theta).  Each long step rides
# run_resumable.sh so a tunnel hang costs one timeout, not the step.
set -u
cd /root/repo
LOG=/tmp/tpu_queue18
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

step hardbc_3dt 16000 benchmarks/run_resumable.sh 3600 4 \
  python -u benchmarks/hardbc_tpu.py --case 3dt --disc 16 --tdisc 10 \
  --width 64 --layers 2 --epochs 24000 --lm-steps 50 --lm-cg 200 \
  --k-chunks 4 --modes hard --folder /tmp/hardbc_q18

step causal_lm12 8000 benchmarks/run_resumable.sh 3600 2 \
  python -u benchmarks/contaminant_causal_lm.py --lm-steps 12 \
  --lm-cg 100 --k-chunks 48

step obstacle_ff 12000 benchmarks/run_resumable.sh 5400 2 \
  python -u benchmarks/obstacle_validation.py --hard-bc --ff 128 \
  --width 96 --layers 3 --epochs 16000 --lm-steps 20 --lm-cg 150 \
  --k-chunks 2 --folder /tmp/obstacle_ff

step flag_w96 20000 benchmarks/run_resumable.sh 5400 4 \
  python -u benchmarks/accuracy_flagship.py --width 96 --layers 3 \
  --persist --k-chunks 24 --folder /tmp/flag_w96

if [ -f benchmarks/results/flagship_theta_w96x3.npz ]; then
  step push_w96 16000 benchmarks/run_resumable.sh 5400 3 \
    python -u benchmarks/flagship_push.py \
    --theta benchmarks/results/flagship_theta_w96x3.npz \
    --disc 64 --tdisc 40 --lam0 1e-9 --lm-steps 40 --lm-cg 400 \
    --k-chunks 32 --folder /tmp/push_w96
fi

step push_w48_d96 16000 benchmarks/run_resumable.sh 5400 3 \
  python -u benchmarks/flagship_push.py \
  --theta benchmarks/results/flagship_theta_1.1e-04.npz \
  --disc 96 --tdisc 56 --lam0 1e-9 --lm-steps 30 --lm-cg 400 \
  --k-chunks 64 --folder /tmp/push_w48_d96

echo "=== queue18 complete $(date -u) ==="
