"""train_causal: growing-time-window curriculum (train/causal.py).

Uses a tiny 1-D source-driven transient problem with homogeneous BC/IC —
the exact shape of the zero-data-attractor configs (DESIGN.md) — and
checks the window mechanics: warm-started stages, fixed dt, a nonzero
final field, and the argument validation.
"""

import numpy as np
import pytest

from varnet_tpu.geometry.domain import Domain1D
from varnet_tpu.problems.adpde import ADPDE
from varnet_tpu.train.causal import train_causal


def _make_pde(t_end):
    # gated Gaussian source, homogeneous BC/IC: u = 0 fits all data terms
    def source(x, t):
        x0 = np.reshape(x, (len(x), -1))[:, 0]
        t0 = np.reshape(t, (len(t), -1))[:, 0]
        g = np.exp(-0.5 * ((x0 - 0.3) / 0.1) ** 2)
        return g * (t0 < 0.3)

    return ADPDE(Domain1D(0.0, 1.0), diff=0.05, vel=0.5, source=source,
                 t_interval=(0.0, float(t_end)), bcs=0.0, ic=0.0)


@pytest.mark.slow
def test_train_causal_windows():
    vn, stages = train_causal(
        _make_pde, windows=(0.5, 1.0), epoch_num=150, weight=(1.0, 10.0, 10.0),
        t_disc_full=8,
        varnet_kwargs=dict(layer_width=(12,), disc_num=12, b_disc_num=4,
                           n_devices=1),
        verbose=False,
    )
    assert [s["t_end"] for s in stages] == [0.5, 1.0]
    # dt held fixed: stage tdisc scales with the window
    assert vn.t_disc_num == 8
    assert all(np.isfinite(s["final_loss"]) for s in stages)
    # the source has driven the field off u = 0
    x = np.linspace(0.05, 0.95, 20)[:, None]
    u = vn.evaluate(x, t=np.full(20, 0.25))
    assert np.abs(u).max() > 1e-3


def test_train_causal_validates_windows():
    with pytest.raises(ValueError):
        train_causal(_make_pde, windows=(0.5, 0.75))  # final != 1.0
    with pytest.raises(ValueError):
        train_causal(_make_pde, windows=(0.75, 0.5, 1.0))  # not increasing
    with pytest.raises(ValueError, match="positive"):
        train_causal(_make_pde, windows=(-0.5, 0.5, 1.0))  # t_end <= 0


def test_train_causal_rejects_colliding_train_kwargs():
    """epoch_num/weight would TypeError deep inside train(); a shared
    folderpath would silently corrupt the per-stage recovery chain
    (review finding, round 3)."""
    for key, val in (("epoch_num", 10), ("weight", (1.0, 1.0, 1.0)),
                     ("folderpath", "/tmp/x"), ("resume", True)):
        with pytest.raises(ValueError, match="train_kwargs"):
            train_causal(_make_pde, windows=(0.5, 1.0), epoch_num=10,
                         train_kwargs={key: val}, verbose=False)


@pytest.mark.slow
def test_train_causal_resume(tmp_path):
    """Cross-process curriculum restart (SURVEY.md §5.3): a completed
    stage is restored and skipped, a partially-trained stage trains only
    its remaining epochs, and resume without folderpath is rejected."""
    import shutil

    from varnet_tpu.train.checkpoint import list_checkpoint_steps

    folder = str(tmp_path / "case")
    kw = dict(
        windows=(0.5, 1.0), epoch_num=100, weight=(1.0, 10.0, 10.0),
        t_disc_full=8,
        varnet_kwargs=dict(layer_width=(12,), disc_num=12, b_disc_num=4,
                           n_devices=1, seed=3),
        train_kwargs=dict(save_freq=50),
        folderpath=folder, verbose=False,
    )
    train_causal(_make_pde, **kw)
    # simulate a death halfway through stage 2: drop its epoch-100
    # checkpoint, keeping epoch 50
    w1 = f"{folder}_w1"
    assert list_checkpoint_steps(w1) == [50, 100]
    shutil.rmtree(f"{w1}/ckpt_{100:010d}")

    vn2, st2 = train_causal(_make_pde, resume=True, **kw)
    assert st2[0].get("resumed") and st2[0]["epochs_done"] == 100
    assert "final_loss" not in st2[0]  # skipped, not retrained
    # stage 2 trained only the remaining 50 epochs, ending at 100
    assert st2[1]["result"].epochs[-1] == 100
    assert list_checkpoint_steps(w1)[-1] == 100
    x = np.linspace(0.05, 0.95, 20)[:, None]
    u = vn2.evaluate(x, t=np.full(20, 0.25))
    assert np.isfinite(u).all() and np.abs(u).max() > 1e-3

    with pytest.raises(ValueError, match="folderpath"):
        train_causal(_make_pde, resume=True, **{
            k: v for k, v in kw.items() if k != "folderpath"})
    with pytest.raises(ValueError, match="train_kwargs"):
        train_causal(_make_pde, **dict(
            kw, train_kwargs=dict(save_freq=50, resume=True)))


@pytest.mark.slow
def test_train_causal_with_hard_bc():
    """Curriculum x exact-imposition composition: every stage's VarNet
    builds its own window transform (tau scales per window, so the warm
    start is approximate — Adam re-adapts); the final model keeps the
    BC/IC exact and the field off u = 0."""
    vn, stages = train_causal(
        _make_pde, windows=(0.5, 1.0), epoch_num=200,
        weight=(1.0, 10.0, 10.0), t_disc_full=8,
        varnet_kwargs=dict(layer_width=(12,), disc_num=12, b_disc_num=4,
                           n_devices=1, hard_bc=True),
        verbose=False,
    )
    assert all(np.isfinite(s["final_loss"]) for s in stages)
    x = np.linspace(0.05, 0.95, 20)[:, None]
    u = vn.evaluate(x, t=np.full(20, 0.25))
    assert np.abs(u).max() > 1e-3, "collapsed to u = 0"
    # exactness survives the curriculum
    ends = np.array([[0.0], [1.0]])
    np.testing.assert_allclose(vn.evaluate(ends, t=np.full(2, 0.7)), 0.0,
                               atol=5e-6)
    np.testing.assert_allclose(vn.evaluate(x, t=np.zeros(20)), 0.0,
                               atol=5e-6)


@pytest.mark.slow
def test_stage_transfer_preserves_field_exactly():
    """hard-BC tau = (t - t0)/(T - t0) rescales by w_prev/w_next when the
    window grows; scaling the net's OUTPUT layer by w_next/w_prev makes
    the warm-started field match the previous stage exactly on the
    overlap (benchmarks/obstacle_causal.py rides this via the
    train_causal(stage_transfer=) hook)."""
    from varnet_tpu.api import VarNet

    kw = dict(layer_width=(10,), disc_num=10, b_disc_num=4, n_devices=1,
              hard_bc=True, input_scaling=False)
    vn1 = VarNet(_make_pde(0.5), t_disc_num=4, **kw)
    vn1.train(epoch_num=40, weight=(1.0, 10.0, 10.0), verbose=False)

    def transfer(theta, wp, wn):
        s = wn / wp
        net = list(theta)
        net[-1] = {"w": net[-1]["w"] * s, "b": net[-1]["b"] * s}
        return net

    vn2 = VarNet(_make_pde(1.0), t_disc_num=8, **kw)
    vn2.theta = transfer(vn1.theta, 0.5, 1.0)
    x = np.linspace(0.05, 0.95, 20)[:, None]
    t = np.full(20, 0.3)
    np.testing.assert_allclose(vn2.evaluate(x, t=t), vn1.evaluate(x, t=t),
                               atol=1e-7)

    # and train_causal threads the hook through the curriculum
    calls = []

    def rec_transfer(theta, wp, wn):
        calls.append((wp, wn))
        return transfer(theta, wp, wn)

    vn3, stages = train_causal(
        _make_pde, windows=(0.5, 1.0), epoch_num=40,
        weight=(1.0, 10.0, 10.0), t_disc_full=8,
        varnet_kwargs=kw, stage_transfer=rec_transfer, verbose=False)
    assert calls == [(0.5, 1.0)]
    assert np.isfinite(vn3.evaluate(x, t=t)).all()
