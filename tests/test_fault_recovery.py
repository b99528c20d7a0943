"""Fault recovery (SURVEY.md §5.3 — checkpoint-restart as the recovery
story): transient-device-error classification, in-process auto-retry of
``train``/``refine_lm`` from the newest checkpoint, and cross-process
``refine_lm(resume=True)`` with globally-numbered LM steps + persisted
lam damping state.

Faults are injected by wrapping the real implementations — the retry
wrappers under test are exactly the production code paths."""

import jax
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d
from varnet_tpu.train.checkpoint import list_checkpoint_steps, load_meta
from varnet_tpu.train.fault import is_transient_device_error


def _flat(theta):
    return np.concatenate([np.ravel(v) for l in theta for v in l.values()])


def _tiny_vn():
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(8, 8), disc_num=12, n_devices=1)
    vn.train(epoch_num=50, weight=(1.0, 10.0), save_freq=50, verbose=False)
    return vn


def test_transient_classification():
    assert is_transient_device_error(
        jax.errors.JaxRuntimeError("UNAVAILABLE: TPU device error")
    )
    # measured tunnel fault mode on this machine (CLAUDE.md known traps)
    assert is_transient_device_error(
        jax.errors.JaxRuntimeError("FAILED_PRECONDITION: tunnel flake")
    )
    # OOM is deterministic for an unchanged program: retryable ONLY when
    # the caller opts in because its retry shrinks the footprint
    assert not is_transient_device_error(
        jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory")
    )
    assert is_transient_device_error(
        jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory"),
        include_oom=True,
    )
    # program errors are not retryable
    assert not is_transient_device_error(
        jax.errors.JaxRuntimeError("INVALID_ARGUMENT: bad shape")
    )
    # deterministic compiler failures surface as INTERNAL but must not
    # re-pay the multi-minute compile per retry
    assert not is_transient_device_error(
        jax.errors.JaxRuntimeError("INTERNAL: Mosaic failed to compile")
    )
    assert not is_transient_device_error(ValueError("UNAVAILABLE"))


@pytest.mark.slow
def test_lm_retry_resumes_from_checkpoint(tmp_path, monkeypatch):
    """First attempt does 2 real LM iters then faults; the retry must
    resume at global step 2 with doubled k_chunks and continue to 4."""
    vn = _tiny_vn()
    real = VarNet._refine_lm_impl
    seen = {"n": 0, "k": []}

    def flaky(self, steps, *args, **kw):
        seen["n"] += 1
        seen["k"].append(args[9])  # k_chunks positional slot
        if seen["n"] == 1:
            real(self, 2, *args, **kw)
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: injected fault")
        return real(self, steps, *args, **kw)

    monkeypatch.setattr(VarNet, "_refine_lm_impl", flaky)
    r = vn.refine_lm(
        steps=4, save_freq=1, cg_iters=3, verbose=False,
        matmul_precision=None, folderpath=str(tmp_path),
        max_retries=1, retry_backoff=0.0,
    )
    lm_dir = str(tmp_path / "lm")  # LM checkpoints are namespaced
    assert seen["n"] == 2
    assert seen["k"] == [1, 2]  # k_chunks doubled on retry
    assert r.epochs == [3, 4]  # global numbering continues past the fault
    assert r.total_steps == 4
    assert list_checkpoint_steps(lm_dir) == [2, 3, 4]  # keep=3
    meta = load_meta(lm_dir, 4)
    assert meta is not None and meta["phase"] == "lm" and "lam" in meta


def test_lm_nontransient_propagates(tmp_path, monkeypatch):
    vn = _tiny_vn()
    seen = {"n": 0}

    def broken(self, *args, **kw):
        seen["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: injected")

    monkeypatch.setattr(VarNet, "_refine_lm_impl", broken)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
        vn.refine_lm(
            steps=2, verbose=False, folderpath=str(tmp_path),
            max_retries=3, retry_backoff=0.0,
        )
    assert seen["n"] == 1  # no retries burned on a program error


@pytest.mark.slow
def test_lm_cross_process_resume(tmp_path):
    """resume=True picks up theta + lam from the newest checkpoint and
    runs only the remaining iterations (global step semantics)."""
    vn = _tiny_vn()
    vn.refine_lm(
        steps=2, save_freq=1, cg_iters=3, verbose=False,
        matmul_precision=None, folderpath=str(tmp_path),
    )
    lm_dir = str(tmp_path / "lm")
    theta_ckpt = _flat(vn.theta)
    lam_ckpt = load_meta(lm_dir, 2)["lam"]

    # "new process": a fresh VarNet with the same config, untrained
    case = steady_ad_1d(kappa=0.1)
    vn2 = VarNet(case["pde"], layer_width=(8, 8), disc_num=12, n_devices=1)
    r = vn2.refine_lm(
        steps=4, save_freq=1, cg_iters=3, verbose=False,
        matmul_precision=None, folderpath=str(tmp_path), resume=True,
    )
    assert r.epochs == [3, 4] and r.total_steps == 4
    assert np.isfinite(lam_ckpt) and lam_ckpt > 0
    # _restore_theta really loads the persisted state: a third fresh net
    # restored from the folder must equal vn2's final theta exactly
    # (the newest checkpoint is step 4, written by vn2's run)
    case = steady_ad_1d(kappa=0.1)
    vn3 = VarNet(case["pde"], layer_width=(8, 8), disc_num=12, n_devices=1)
    step3, lam3 = vn3._restore_theta(lm_dir)
    assert step3 == 4 and lam3 is not None
    np.testing.assert_allclose(_flat(vn3.theta), _flat(vn2.theta))
    assert not np.allclose(_flat(vn3.theta), theta_ckpt)  # steps 3-4 moved it

    # already done: steps <= newest checkpoint is a no-op
    r2 = vn2.refine_lm(
        steps=4, verbose=False, folderpath=str(tmp_path), resume=True,
    )
    assert r2.epochs == [] and r2.total_steps == 4


def test_train_retry_without_checkpoints(monkeypatch, tmp_path):
    """A fault before the first checkpoint write must not break the
    retry (resume would find an empty folder): it restarts clean."""
    vn = _tiny_vn()
    real = VarNet._train_impl
    seen = {"n": 0}

    def flaky(self, *args, **kw):
        seen["n"] += 1
        if seen["n"] == 1:
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: injected fault")
        return real(self, *args, **kw)

    monkeypatch.setattr(VarNet, "_train_impl", flaky)
    r = vn.train(
        epoch_num=20, weight=(1.0, 10.0), save_freq=20, verbose=False,
        folderpath=str(tmp_path), max_retries=1, retry_backoff=0.0,
    )
    assert seen["n"] == 2
    assert np.isfinite(r.losses[-1]["loss"])


def test_train_retry_resumes_mid_run(monkeypatch, tmp_path):
    """A fault after checkpoints exist resumes from the newest epoch."""
    vn = _tiny_vn()
    real = VarNet._train_impl
    seen = {"n": 0}

    def flaky(self, epoch_num, weight, batch_num, save_freq, folderpath,
              resume, *args, **kw):
        seen["n"] += 1
        if seen["n"] == 1:
            # complete 10 epochs (one checkpoint at save_freq=10), then die
            real(self, 10, weight, batch_num, 10, folderpath, resume,
                 *args, **kw)
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: injected fault")
        assert resume, "retry with checkpoints present must resume"
        assert epoch_num == 10, "retry must request only the remainder"
        return real(self, epoch_num, weight, batch_num, save_freq,
                    folderpath, resume, *args, **kw)

    monkeypatch.setattr(VarNet, "_train_impl", flaky)
    r = vn.train(
        epoch_num=20, weight=(1.0, 10.0), save_freq=10, verbose=False,
        folderpath=str(tmp_path), max_retries=1, retry_backoff=0.0,
    )
    assert seen["n"] == 2
    # the retry asks only for the REMAINING epochs: 10 done pre-fault,
    # so the resumed run stops at the originally-requested total of 20
    assert r.epochs[-1] == 20


def test_train_resume_on_empty_folder_starts_fresh(tmp_path):
    """resume=True on a folder with NO checkpoints yet (the previous
    attempt died before its first save_freq save) starts fresh instead of
    raising FileNotFoundError — the documented hang-recovery loop
    (run_resumable.sh re-runs the same command +--resume) must make
    progress on every attempt."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_1d

    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=8, n_devices=1,
                seed=0)
    folder = str(tmp_path / "fresh")
    res = vn.train(epoch_num=6, save_freq=3, verbose=False,
                   folderpath=folder, resume=True)
    assert res.epochs[-1] == 6
    # and a SECOND resume picks up the persisted state and completes the
    # (now larger) TOTAL budget — global epoch semantics
    res2 = vn.train(epoch_num=9, save_freq=3, verbose=False,
                    folderpath=folder, resume=True)
    assert res2.epochs[-1] == 9
