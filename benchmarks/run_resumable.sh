#!/bin/bash
# Hang-resilient driver for long TPU runs (SURVEY.md §5.3).
#
# The in-process retry (VarNet train/refine_lm max_retries=) covers
# faults that RAISE; a hard-wedged device tunnel can instead HANG the
# process with no error (measured: the flagship LM continuation froze
# mid-iteration for 2 h).  The cure is process-level: bound each attempt
# with `timeout`, then relaunch with --resume so the library continues
# from its checkpoints.
#
# Usage:
#   benchmarks/run_resumable.sh <timeout_s> <attempts> <cmd...>
# e.g.
#   benchmarks/run_resumable.sh 1800 3 \
#     python -u benchmarks/flagship_push.py --lam0 1e-9
#
# The first attempt runs <cmd...> as given; attempts 2..N append
# --resume (all resumable entry points accept it: flagship_push.py,
# contaminant_causal.py, the example CLIs).  Exits 0 on the first
# attempt that completes, with the last attempt's code otherwise.
#
# BENCH PREEMPTION (one TPU process at a time, CLAUDE.md): the current
# attempt's pid is published in /tmp/varnet_tpu_step.pid so bench.py can
# SIGTERM it and take the chip; while /tmp/varnet_bench.lock exists
# (fresh — stale locks >1h are ignored) new attempts WAIT, then resume
# from checkpoints as if the attempt had timed out.  The lock wait does
# not consume an attempt.

set -u
timeout_s="$1"; attempts="$2"; shift 2
pidfile=/tmp/varnet_tpu_step.pid
lock=/tmp/varnet_bench.lock

for ((i = 1; i <= attempts; i++)); do
    while [ -f "$lock" ]; do
        now=$(date +%s); ts=$(cat "$lock" 2>/dev/null || echo 0)
        case "$ts" in (*[!0-9]*|'') ts=0;; esac
        if (( now - ts > 3600 )); then
            echo "[run_resumable] ignoring stale bench lock" >&2
            break
        fi
        echo "[run_resumable] waiting for bench lock" >&2
        sleep 60
    done
    extra=()
    if ((i > 1)) || ((${preempts:=0} > 0)); then
        # resume after a failed attempt OR a bench preemption (the
        # preempted attempt checkpointed; restarting fresh would lose it)
        extra=(--resume)
        echo "[run_resumable] attempt $i/$attempts (resuming)" >&2
    fi
    timeout --signal=TERM --kill-after=60 "$timeout_s" "$@" "${extra[@]}" &
    pid=$!
    echo "$pid" > "$pidfile"
    # TOCTOU re-check (ADVICE r3): bench.py may have taken the lock in
    # the window between our lock check and the pidfile write, in which
    # case it read no pid and will open the chip — yield immediately.
    if [ -f "$lock" ]; then
        now=$(date +%s); ts=$(cat "$lock" 2>/dev/null || echo 0)
        case "$ts" in (*[!0-9]*|'') ts=0;; esac
        if (( now - ts <= 3600 )); then
            echo "[run_resumable] bench lock appeared post-launch; yielding" >&2
            kill -TERM "$pid" 2>/dev/null
            # ADVICE r4: a child mid-XLA-compile can sit on SIGTERM for
            # minutes while bench (which saw no pidfile) opens the chip
            # — the exact two-process collision this yield prevents.
            # Escalate like preempt.py does.
            ( sleep 20; kill -KILL "$pid" 2>/dev/null ) &
        fi
    fi
    wait "$pid"
    rc=$?
    rm -f "$pidfile"
    if ((rc == 0)); then
        exit 0
    fi
    if [ -f "$lock" ] && (( ${preempts:=0} < 5 )); then
        # killed by a bench preemption, not a hang/fault: the attempt
        # doesn't count (bounded so a wedged lock can't loop forever)
        preempts=$((preempts + 1))
        i=$((i - 1))
        echo "[run_resumable] preempted by bench ($preempts)" >&2
        continue
    fi
    echo "[run_resumable] attempt $i/$attempts exited rc=$rc" >&2
    sleep 30
done
exit "$rc"
