"""Cooperative single-TPU handoff between the benchmark queues and the
driver bench (SURVEY.md §5.3 operational story; CLAUDE.md: this machine
has ONE chip behind a tunnel and a second TPU process blocks or dies).

Long queue runs publish their current attempt's pid in
``/tmp/varnet_tpu_step.pid`` and are bounded by ``timeout`` + ``--resume``
checkpoints (benchmarks/run_resumable.sh).  A caller that NEEDS the chip
now (bench.py at round end) takes it with :func:`preempt_queue_step`:

  1. create ``/tmp/varnet_bench.lock`` (content = epoch seconds; waiters
     ignore locks older than an hour, so a crashed bench cannot starve
     the queue forever),
  2. SIGTERM the published pid — an EXPLICIT pid from a pidfile, never a
     pattern match — and wait for it to exit,
  3. run, then ``release()`` (also registered via atexit).

run_resumable waits on the lock before (re)launching attempts and does
not count a preempted attempt, so the queue step resumes from its
checkpoints exactly as after a tunnel-hang timeout.
"""

from __future__ import annotations

import atexit
import os
import signal
import time

LOCK = "/tmp/varnet_bench.lock"
PIDFILE = "/tmp/varnet_tpu_step.pid"


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def preempt_queue_step(wait_s: float = 180.0, verbose: bool = True):
    """Take the TPU from a running queue step, if any.

    Returns a ``release()`` callable (idempotent, atexit-registered).
    Call BEFORE the first jax device touch — the whole point is that the
    queue's process must be gone before this process opens the tunnel.
    """
    with open(LOCK, "w") as f:
        f.write(str(int(time.time())))

    def release():
        try:
            os.remove(LOCK)
        except FileNotFoundError:
            pass

    atexit.register(release)

    # Re-poll the pidfile briefly: run_resumable checks the lock BEFORE
    # launching + publishing its pid, so an attempt launched in that
    # window appears here a moment after we took the lock (TOCTOU fix —
    # ADVICE r3; run_resumable also re-checks the lock on its side).
    # 3 s covers the actual race (run_resumable writes its pidfile within
    # milliseconds of passing the lock check); the original 10 s poll
    # delayed EVERY bench start even with no queue running (ADVICE r4).
    pid = None
    deadline0 = time.time() + 3.0
    while pid is None and time.time() < deadline0:
        try:
            with open(PIDFILE) as f:
                pid = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            time.sleep(1.0)
    if pid is not None and _alive(pid):
        if verbose:
            print(f"[preempt] SIGTERM queue step pid {pid}, waiting",
                  flush=True)
        try:
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
        deadline = time.time() + wait_s
        while _alive(pid) and time.time() < deadline:
            time.sleep(2.0)
        if _alive(pid):
            # timeout(1) already arms --kill-after; escalate ourselves
            # too, then give the tunnel a moment to drop the session
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            time.sleep(10.0)
        else:
            time.sleep(5.0)
        if verbose:
            print("[preempt] chip free", flush=True)
    return release
