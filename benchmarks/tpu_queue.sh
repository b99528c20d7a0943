#!/bin/bash
# Serial TPU work queue for post-outage catch-up (one chip, ONE process
# at a time — CLAUDE.md).  Each step logs to $LOGDIR/<step>.log and drops
# a .done marker so the queue is re-runnable after interruption.
#
# Usage:  benchmarks/tpu_queue.sh [logdir]     (default /tmp/tpu_queue)
#
# Queue (CLAUDE.md round-3 pending list):
#   1. bench sanity (default directional kernel config)
#   2. precoeff kernel probe (BENCH_PRECOEFF=1)
#   3. sublane-alignment probe (precoeff + pad H 20->24, G=5 then G=4)
#   4. flagship LM push continuation (--resume --lam0 1e-11; the frozen
#      run was at rel-L2 1.169e-4, under the 1.195e-4 pin)
#   5. order-2 flagship floor study (order 2 then order 1 at disc 16)
#   6. causal contaminant LM polish (hang-resilient wrapper)

set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/tpu_queue}"
mkdir -p "$LOGDIR"

wait_for_tpu() {
    while true; do
        if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
x = jnp.dot(jnp.ones((128, 128)), jnp.ones((128, 128)))[0, 0]
assert float(x) == 128.0
" >/dev/null 2>&1; then
            echo "[tpu_queue] chip is up"
            return 0
        fi
        echo "[tpu_queue] chip down, retry in 180s"
        sleep 180
    done
}

step() {  # step <name> <timeout_s> <cmd...>
    local name="$1" tmo="$2"; shift 2
    if [[ -e "$LOGDIR/$name.done" ]]; then
        echo "[tpu_queue] $name: already done, skipping"
        return 0
    fi
    wait_for_tpu
    echo "[tpu_queue] $name: starting ($(date -u +%H:%M:%S))"
    if timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1; then
        touch "$LOGDIR/$name.done"
        echo "[tpu_queue] $name: OK"
    else
        echo "[tpu_queue] $name: FAILED/TIMED OUT (rc=$?) — see $LOGDIR/$name.log"
    fi
}

step bench_sanity        1800 python -u bench.py
step bench_precoeff      1800 env BENCH_PRECOEFF=1 python -u bench.py
step bench_sublane_g5    2400 env BENCH_PRECOEFF=1 BENCH_SUBLANE=1 BENCH_QBLOCK=5 python -u bench.py
step bench_sublane_g4    1800 env BENCH_PRECOEFF=1 BENCH_SUBLANE=1 BENCH_QBLOCK=4 python -u bench.py
# Warm-start from the PERSISTED 1.195e-4 theta (the /tmp LM checkpoints
# of the frozen 1.169e-4 continuation were lost to a machine restart).
step flagship_push       14400 benchmarks/run_resumable.sh 2400 6 \
    python -u benchmarks/flagship_push.py --resume --lam0 1e-11 \
    --theta benchmarks/results/flagship_theta_1.2e-04.npz
step order2_flagship_o2  14400 benchmarks/run_resumable.sh 3600 4 \
    python -u benchmarks/order2_floor.py --order 2 --disc 16 --tdisc 12 \
    --folder /tmp/order2_o2
step order2_flagship_o1  10800 benchmarks/run_resumable.sh 3600 3 \
    python -u benchmarks/order2_floor.py --order 1 --disc 16 --tdisc 12 \
    --folder /tmp/order2_o1
step causal_lm           10800 benchmarks/run_resumable.sh 3600 3 \
    python -u benchmarks/contaminant_causal_lm.py

echo "[tpu_queue] queue complete"

# --- appended mid-outage (round 3 cont.): Fourier directional kernel ---
# FF bench at the contaminant flagship's net shape (width 96, ff128
# multi-scale): new fused FF kernel vs the value+jac fallback it replaces.
step bench_ff_fused      2400 env BENCH_FOURIER=128 BENCH_WIDTH=96 python -u bench.py
step bench_ff_fallback   2400 env BENCH_FOURIER=128 BENCH_WIDTH=96 BENCH_NO_FUSED=1 python -u bench.py

echo "[tpu_queue] appended steps complete"

# --- appended post-outage (round 3 cont.): 3-D TPU floor numbers ---
# CLAUDE.md manual follow-up: first TPU rows for the 3-D steady case
# (CPU floors were 5.7e-3/5.6e-3 at disc 8/12 width 32, 4.44e-3 at
# disc 8 width 64).  TPU makes the bigger meshes cheap: width 64 at
# disc 12 and 16, longer Adam + deeper LM.
step ad3d_tpu_d12        7200 benchmarks/run_resumable.sh 2400 3 \
    python -u benchmarks/ad3d_floor.py --disc 12 --width 64 \
    --epochs 12000 --lm-steps 60 --lm-cg 150 --error-disc 32 \
    --folder /tmp/ad3d_d12
step ad3d_tpu_d16        10800 benchmarks/run_resumable.sh 3600 3 \
    python -u benchmarks/ad3d_floor.py --disc 16 --width 64 \
    --epochs 12000 --lm-steps 60 --lm-cg 150 --error-disc 32 \
    --folder /tmp/ad3d_d16

echo "[tpu_queue] 3-D steps complete"

# --- appended (round 3 cont.): ensemble + LM-precond TPU measurements ---
# Ensemble scaling at the bench shape: the MXU-underutilization claim
# behind train_ensemble (DESIGN.md 14) — member-evals/s for E in 2/4/8
# vs the single-net XLA-path bar.
step ensemble_bench      3600 python -u benchmarks/ensemble_bench.py \
    --tpu --disc 48 --tdisc 32 --epochs 300 --members 2 4 8
# Jacobi-PCG A/B at a flagship-like shape (DESIGN.md 13): equal cg_iters
# with and without the Hutchinson diagonal — decides whether production
# LM recipes can cut cg_iters.
step lm_precond_tpu      5400 python -u benchmarks/lm_precond_probe.py \
    --tpu --disc 48 --tdisc 32 --width 32 --epochs 6000 \
    --lm-steps 8 --cg-iters 100 --k-chunks 8 \
    --out benchmarks/results/lm_precond_tpu.json

echo "[tpu_queue] ensemble/precond steps complete"

# Final sanity: the driver's exact bench command on the final round-3
# code (the trainer aux packing was refactored for ensembles after the
# first sanity run — re-validate before the driver's own run).
step bench_final         2400 python -u bench.py

echo "[tpu_queue] final sanity complete"
