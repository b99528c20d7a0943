"""Cooperative TPU handoff helper (utils/preempt.py).  The full
SIGTERM->lock-wait->resume protocol is shell-level (run_resumable.sh,
exercised with a stand-in step); these pin the Python half's contracts:
lock lifecycle, idempotent release, and the no-step fast path.
"""

import pytest

import os

import varnet_tpu.utils.preempt as pre


@pytest.mark.slow
def test_no_step_is_noop_but_holds_lock(tmp_path, monkeypatch):
    lock = tmp_path / "bench.lock"
    pidfile = tmp_path / "step.pid"
    monkeypatch.setattr(pre, "LOCK", str(lock))
    monkeypatch.setattr(pre, "PIDFILE", str(pidfile))

    release = pre.preempt_queue_step(wait_s=1.0, verbose=False)
    # lock exists (so a queue launched NOW would wait) with epoch content
    assert lock.exists() and int(lock.read_text()) > 0
    release()
    assert not lock.exists()
    release()  # idempotent
    assert not lock.exists()


def test_dead_pid_skips_kill_wait(tmp_path, monkeypatch):
    lock = tmp_path / "bench.lock"
    pidfile = tmp_path / "step.pid"
    pidfile.write_text("999999999")  # beyond pid_max: never alive
    monkeypatch.setattr(pre, "LOCK", str(lock))
    monkeypatch.setattr(pre, "PIDFILE", str(pidfile))

    import time

    t0 = time.time()
    release = pre.preempt_queue_step(wait_s=30.0, verbose=False)
    assert time.time() - t0 < 5.0  # no 30 s wait for a dead pid
    release()


@pytest.mark.slow
def test_garbage_pidfile_tolerated(tmp_path, monkeypatch):
    lock = tmp_path / "bench.lock"
    pidfile = tmp_path / "step.pid"
    pidfile.write_text("not-a-pid")
    monkeypatch.setattr(pre, "LOCK", str(lock))
    monkeypatch.setattr(pre, "PIDFILE", str(pidfile))
    release = pre.preempt_queue_step(wait_s=1.0, verbose=False)
    assert lock.exists()
    release()


def test_alive_self():
    assert pre._alive(os.getpid())
    assert not pre._alive(999999999)
