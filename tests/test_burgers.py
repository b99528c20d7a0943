"""Nonlinear advection (viscous Burgers family, beyond-reference —
``ADPDE(nl_adv=b)`` adds u (b . grad u) to the otherwise-linear AD-PDE,
SURVEY.md §0's weak form extended with one more first-derivative term):
keystone residual-of-exact-solution checks, an end-to-end train on the
steady standing shock, and the LM path through the nonlinear residual."""

import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import Domain1D
from varnet_tpu.problems.adpde import ADPDE
from varnet_tpu.problems.analytic import (
    burgers_1d_steady,
    burgers_1d_transient,
    burgers_2d_manufactured,
)


def residual_of_function_nl(fixed, value_fn, grad_fn, nl_vec, dt_fn=None):
    """residual_of_function (tests/test_assembly.py) + the nonlinear
    advection term u (b . grad u) — pure NumPy, independent of the jax
    ops path."""
    q = fixed.quad
    k, nq, _ = q.coords.shape
    d = q.dN.shape[1]
    td = fixed.static.time_dependent
    flat = q.coords.reshape(k * nq, -1)
    x, t = flat[:, :d], (flat[:, d] if td else None)
    u = value_fn(x, t).reshape(k, nq)
    gu = grad_fn(x, t).reshape(k, nq, d)
    b = np.atleast_1d(np.asarray(nl_vec, dtype=np.float64))
    integrand = (np.einsum("kqd,kqd->kq", q.vel, gu) - q.src) * q.N
    integrand += u * np.einsum("kqd,d->kq", gu, b) * q.N
    integrand += q.kappa * np.einsum("kqd,qd->kq", gu, q.dN)
    if td:
        integrand += dt_fn(x, t).reshape(k, nq) * q.N
    return np.einsum("kq,q->k", integrand, q.w) * q.mask


def test_nl_adv_validation():
    with pytest.raises(ValueError, match="nl_adv"):
        ADPDE(Domain1D(0, 1), diff=0.1, vel=0.0, nl_adv=(1.0, 2.0),
              bcs=[0.0, 1.0])
    # all-zero b degenerates to the linear PDE (nl_adv -> None)
    pde = ADPDE(Domain1D(0, 1), diff=0.1, vel=0.0, nl_adv=0.0,
                bcs=[0.0, 1.0])
    assert pde.nl_adv is None


def test_burgers_steady_residual_converges():
    """Keystone (SURVEY.md §4): the weak residual of the exact standing
    shock vanishes under mesh refinement."""
    case = burgers_1d_steady()
    maxr = []
    for disc in (16, 32):
        fixed = build_fixed_data(case["pde"], disc_num=disc)
        r = residual_of_function_nl(
            fixed, case["c_ex"], case["c_ex_grad"], case["pde"].nl_adv)
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 2.5, maxr
    assert maxr[1] < 5e-2, maxr


def test_burgers_transient_residual_converges():
    case = burgers_1d_transient()
    maxr = []
    for disc, tdisc in ((12, 8), (24, 16)):
        fixed = build_fixed_data(case["pde"], disc_num=disc,
                                 t_disc_num=tdisc)
        r = residual_of_function_nl(
            fixed, case["c_ex"], case["c_ex_grad"], case["pde"].nl_adv,
            case["c_ex_dt"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 2.5, maxr
    assert maxr[1] < 5e-2, maxr


def test_burgers_2d_manufactured_residual_converges():
    """Vector-b case: the manufactured source must exactly balance the
    nonlinear term (catches sign/orientation errors in s)."""
    case = burgers_2d_manufactured()
    maxr = []
    for disc, tdisc in ((8, 6), (16, 12)):
        fixed = build_fixed_data(case["pde"], disc_num=disc,
                                 t_disc_num=tdisc, b_disc_num=8)
        r = residual_of_function_nl(
            fixed, case["c_ex"], case["c_ex_grad"], case["pde"].nl_adv,
            case["c_ex_dt"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 2.5, maxr
    assert maxr[1] < 5e-2, maxr


def test_burgers_steady_trains_to_front():
    """End-to-end: the nonlinear loss path drives the net to the standing
    shock (boundary-driven — no zero-data attractor here: u=0 violates
    the BCs)."""
    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(20, 20), disc_num=24, seed=1,
                n_devices=1)
    vn.train(epoch_num=2500, weight=(1.0, 10.0), save_freq=500,
             verbose=False, matmul_precision="highest")
    x = np.linspace(0, 1, 101)[:, None]
    u = vn.evaluate(x)
    rel = np.linalg.norm(u - case["c_ex"](x)) / np.linalg.norm(case["c_ex"](x))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_burgers_lm_path():
    """refine_lm's residual vector includes the nonlinear term: sum(r^2)
    must equal the train loss at the same theta, and a few LM iterations
    must not diverge."""
    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(16,), disc_num=16, seed=0,
                n_devices=1)
    r0 = vn.train(epoch_num=300, weight=(1.0, 10.0), save_freq=100,
                  verbose=False)
    r = vn.refine_lm(steps=3, weight=(1.0, 10.0), cg_iters=30,
                     save_freq=1, verbose=False)
    assert r.losses[-1]["loss"] <= r0.losses[-1]["loss"] * 1.05
    # LM actually moved the loss (the nonlinear J v / J^T w closures work)
    assert r.losses[-1]["loss"] < r0.losses[-1]["loss"]


def test_nl_forces_jacobian_panel_kernel():
    """The DIRECTIONAL fused kernel cannot express u (b . grad u) (its
    single precomputed contraction direction is theta-independent), so
    nonlinear problems are forced onto the jacobian-panel variant —
    still fully fused (numerics pinned in tests/test_pallas_residual.py
    test_fused_residual_nl_matches_reference)."""
    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(16,), disc_num=8, n_devices=1,
                use_pallas=True)
    hook = vn._fused_residual_hook("highest")
    assert hook is not None and hook.keywords["directional"] is False
    assert hook.keywords["nl_vec"] == (1.0,)


def test_burgers_adaptive_compose():
    """Composition with adaptive refinement: test_residuals and
    refine_tests ride the nonlinear residual path, and a short
    continuation on the enriched space keeps training (WHERE the density
    peaks is training-stage-dependent — boundary-dominated early,
    front-dominated late — so only the mechanism is asserted here)."""
    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(16,), disc_num=16, seed=1,
                n_devices=1)
    r0 = vn.train(epoch_num=800, weight=(1.0, 10.0), save_freq=400,
                  verbose=False)
    r = vn.test_residuals()
    assert r.shape == (vn.static.n_test,) and np.all(np.isfinite(r))
    n0 = vn.static.n_test
    vn.refine_tests(frac=0.2, verbose=False)
    assert vn.static.n_test > n0
    r1 = vn.train(epoch_num=400, weight=(1.0, 10.0), save_freq=200,
                  verbose=False)
    assert np.isfinite(r1.losses[-1]["loss"])
    assert r1.losses[-1]["loss"] < r0.losses[0]["loss"]


@pytest.mark.slow
def test_burgers_causal_compose():
    """Composition with the causal growing-window curriculum: the
    traveling front trains window-by-window through the SAME nonlinear
    loss path."""
    from varnet_tpu.train.causal import train_causal
    from varnet_tpu.problems.analytic import burgers_1d_transient

    T = 0.8

    def make_pde(w):  # w = window FRACTION of the full interval
        return burgers_1d_transient(t_final=T * w)["pde"]

    vn, stages = train_causal(
        make_pde, windows=(0.5, 1.0), epoch_num=200,
        weight=(1.0, 10.0, 10.0), t_disc_full=8,
        varnet_kwargs=dict(layer_width=(12,), disc_num=12, b_disc_num=4,
                           n_devices=1),
        verbose=False,
    )
    assert [s["t_end"] for s in stages] == [0.5, 1.0]
    assert stages[-1]["final_loss"] < stages[0]["final_loss"] * 50
    assert np.isfinite(stages[-1]["final_loss"])


def test_burgers_mor_compose():
    """Composition with MOR: one net amortizes the standing-shock family
    over viscosity (mu = nu enters kappa AND the exact solution; the
    nonlinear term is mu-independent).  Keystone: the per-sample exact
    shocks have vanishing weak residual through the paired fixed data."""
    from varnet_tpu.problems.adpde import MORVar

    a = 1.0
    nus = np.array([[0.06], [0.1]])

    def u_exact(x1, nu):
        return -a * np.tanh(a * (x1 - 0.5) / (2.0 * nu))

    pde = ADPDE(
        Domain1D(0.0, 1.0),
        diff=lambda x, t, mu: mu[:, 0],
        vel=0.0, source=0.0, nl_adv=1.0,
        bcs=[lambda x, t, mu: u_exact(np.atleast_2d(x)[:, 0], mu[:, 0]),
             lambda x, t, mu: u_exact(np.atleast_2d(x)[:, 0], mu[:, 0])],
        mor=MORVar(samples=nus),
    )
    fixed = build_fixed_data(pde, disc_num=32)
    q = fixed.quad
    k, nq, _ = q.coords.shape
    x1, mu = q.coords[:, :, 0].ravel(), q.coords[:, :, 1].ravel()
    u = u_exact(x1, mu).reshape(k, nq)
    gu = (-a**2 / (2 * mu) / np.cosh(a * (x1 - 0.5) / (2 * mu)) ** 2
          ).reshape(k, nq, 1)
    integrand = (u * gu[:, :, 0] - q.src) * q.N  # b=1: u u_x
    integrand += q.kappa * np.einsum("kqd,qd->kq", gu, q.dN)
    r = np.einsum("kq,q->k", integrand, q.w) * q.mask
    assert np.max(np.abs(r)) / np.sum(q.w) < 5e-2
    # kappa was paired from mu per sample block
    half = k // 2
    np.testing.assert_allclose(q.kappa[:half], 0.06)
    np.testing.assert_allclose(q.kappa[half:], 0.1)
    # and the nonlinear MOR problem trains
    vn = VarNet(pde, layer_width=(12, 12), disc_num=16, seed=1,
                n_devices=1)
    res = vn.train(epoch_num=400, weight=(1.0, 10.0), save_freq=200,
                   verbose=False)
    assert res.losses[-1]["loss"] < res.losses[0]["loss"]
    u5 = vn.evaluate(np.linspace(0, 1, 5)[:, None], mu=np.array([0.08]))
    assert u5.shape == (5,) and np.all(np.isfinite(u5))


def test_burgers_2d_front_residual_converges():
    """Keystone for the TRUE analytic 2-D nonlinear solution (planar
    tanh front, no manufactured source): the derivation's constants
    (s = beta*speed, k = beta*amp/(2 nu)) must balance u_t, u (b.grad u)
    and the diffusion exactly."""
    from varnet_tpu.problems.analytic import burgers_2d_front

    case = burgers_2d_front()
    maxr = []
    for disc, tdisc in ((10, 6), (20, 12)):
        fixed = build_fixed_data(case["pde"], disc_num=disc,
                                 t_disc_num=tdisc, b_disc_num=8)
        r = residual_of_function_nl(
            fixed, case["c_ex"], case["c_ex_grad"], case["pde"].nl_adv,
            case["c_ex_dt"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 2.5, maxr
    assert maxr[1] < 5e-2, maxr


@pytest.mark.slow
def test_burgers_sharded_matches_single_device():
    """Nonlinear-path data sharding over the 8-device mesh reproduces the
    1-device loss (the nl term is pointwise-local, so the single packed
    psum stays sufficient)."""
    case = burgers_1d_transient()

    def run(nd):
        vn = VarNet(case["pde"], layer_width=(12,), disc_num=12,
                    t_disc_num=6, b_disc_num=4, n_devices=nd, seed=3)
        r = vn.train(epoch_num=20, weight=(1.0, 10.0, 10.0), save_freq=1,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    l8, l1 = run(8), run(1)
    np.testing.assert_allclose(l8[0], l1[0], rtol=1e-5)
