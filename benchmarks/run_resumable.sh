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

set -u
timeout_s="$1"; attempts="$2"; shift 2

for ((i = 1; i <= attempts; i++)); do
    extra=()
    if ((i > 1)); then
        extra=(--resume)
        echo "[run_resumable] attempt $i/$attempts (resuming)" >&2
    fi
    timeout --signal=TERM --kill-after=60 "$timeout_s" "$@" "${extra[@]}"
    rc=$?
    if ((rc == 0)); then
        exit 0
    fi
    echo "[run_resumable] attempt $i/$attempts exited rc=$rc" >&2
    sleep 30
done
exit "$rc"
