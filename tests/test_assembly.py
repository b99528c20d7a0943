"""Fixed-data assembly tests, centred on the residual-of-analytic-solution
check — 'the single most valuable test' (SURVEY.md §4): the weak-form
residual of the exact PDE solution, pushed through mesh + quadrature +
field evaluation, must vanish (exactly for polynomial solutions, at the
quadrature convergence rate for smooth ones)."""

import numpy as np
import pytest

from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import Domain1D, RectangleDomain2D
from varnet_tpu.problems.adpde import ADPDE, MORVar
from varnet_tpu.problems.analytic import (
    lshape_manufactured_2d,
    steady_ad_1d,
    steady_ad_2d,
    transient_ad_1d,
    transient_ad_2d,
)


def residual_of_function(fixed, grad_fn, dt_fn=None):
    """Weak residual r_k of a KNOWN function via the assembled fixed data
    (pure NumPy; independent of the jax ops path)."""
    q = fixed.quad
    k, nq, _ = q.coords.shape
    d = q.dN.shape[1]
    td = fixed.static.time_dependent
    flat = q.coords.reshape(k * nq, -1)
    x, t = flat[:, :d], (flat[:, d] if td else None)
    gu = grad_fn(x, t).reshape(k, nq, d)
    integrand = (np.einsum("kqd,kqd->kq", q.vel, gu) - q.src) * q.N
    integrand += q.kappa * np.einsum("kqd,qd->kq", gu, q.dN)
    if td:
        integrand += dt_fn(x, t).reshape(k, nq) * q.N
    return np.einsum("kq,q->k", integrand, q.w) * q.mask


def test_linear_solution_exact_residual_1d():
    """u = 2 + 3x with s = v u_x: integrands are polynomials within the
    2-point Gauss degree, so r_k is zero to machine precision."""
    v, kappa = 0.7, 0.1
    pde = ADPDE(Domain1D(0, 1), diff=kappa, vel=v, source=v * 3.0, bcs=[2.0, 5.0])
    fixed = build_fixed_data(pde, disc_num=13)
    r = residual_of_function(fixed, lambda x, t: np.full((x.shape[0], 1), 3.0))
    assert np.max(np.abs(r)) < 1e-14


def test_quadratic_solution_exact_residual_2d():
    """u = x^2 + x y on the unit square; s = v . grad u - kappa lap u is
    exactly integrated by the 2-point rule -> r_k ~ machine eps."""
    kappa = 0.3
    vel = np.array([1.1, -0.4])

    def grad(x, t=None):
        return np.stack([2 * x[:, 0] + x[:, 1], x[:, 0]], axis=-1)

    def source(x, t=None):
        g = grad(x)
        return vel[0] * g[:, 0] + vel[1] * g[:, 1] - kappa * 2.0

    pde = ADPDE(
        RectangleDomain2D((0, 0), (1, 1)), diff=kappa, vel=vel,
        source=source, bcs=0.0,
    )
    fixed = build_fixed_data(pde, disc_num=9)
    r = residual_of_function(fixed, grad)
    assert np.max(np.abs(r)) < 1e-13


@pytest.mark.parametrize("case_fn,disc,tdisc", [
    (steady_ad_1d, (16, 32), None),
    (steady_ad_2d, (8, 16), None),
    # resolved front (kappa, t_eps chosen so the initial width >~ h)
    (lambda: transient_ad_1d(kappa=0.1, t_eps=0.05), (16, 32), (16, 32)),
    (transient_ad_2d, (8, 16), (8, 16)),
    # non-convex polygon: hats around the re-entrant corner included
    (lshape_manufactured_2d, (8, 16), None),
])
def test_analytic_solution_residual_converges(case_fn, disc, tdisc):
    """For smooth exact solutions, max_k |r_k| (normalized by the support
    volume) must shrink superlinearly under mesh refinement."""
    case = case_fn()
    maxr = []
    for i in range(2):
        td = None if tdisc is None else tdisc[i]
        fixed = build_fixed_data(case["pde"], disc_num=disc[i], t_disc_num=td)
        r = residual_of_function(fixed, case["c_ex_grad"], case["c_ex_dt"])
        vol = np.sum(fixed.quad.w)
        maxr.append(np.max(np.abs(r)) / vol)
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


def test_fixed_data_shapes_steady_1d():
    case = steady_ad_1d()
    fixed = build_fixed_data(case["pde"], disc_num=10)
    q = fixed.quad
    assert q.coords.shape == (9, 4, 1)   # 9 interior nodes, (2*2)^1 quad pts
    assert q.N.shape == (4,) and q.dN.shape == (4, 1) and q.w.shape == (4,)
    assert fixed.bc.coords.shape == (2, 1)
    np.testing.assert_allclose(fixed.bc.values, [0.0, 1.0])
    assert fixed.ic is None
    assert fixed.static.n_inputs == 1


def test_fixed_data_shapes_transient_2d():
    case = transient_ad_2d()
    fixed = build_fixed_data(case["pde"], disc_num=6, t_disc_num=5, b_disc_num=3)
    q = fixed.quad
    k = 5 * 5 * 4          # (7-2)^2 interior spatial x (6-2+1)=4 interior time
    assert q.coords.shape == (k, 64, 3)  # (2*2)^3 quad pts, inputs (x,y,t)
    assert q.dN.shape == (64, 2)         # spatial gradient only
    assert fixed.bc.coords.shape[0] == 4 * 3 * 6   # 4 half-open edges x 3 pts x 6 t-nodes
    assert fixed.ic.coords.shape[0] == 5 * 5       # strict-interior grid at t=0
    np.testing.assert_allclose(fixed.ic.coords[:, 2], 0.0)
    assert fixed.static.time_dependent


def test_padding_and_masks():
    case = steady_ad_2d()
    fixed = build_fixed_data(case["pde"], disc_num=7, pad_multiple=8)
    q = fixed.quad
    assert q.coords.shape[0] % 8 == 0
    assert int(q.mask.sum()) == fixed.static.n_test == 36
    assert fixed.bc.coords.shape[0] % 8 == 0
    assert int(fixed.bc.mask.sum()) == fixed.static.n_bc


def test_mor_pairing():
    case = steady_ad_1d()
    pde = case["pde"]
    samples = np.array([[0.5], [1.0], [2.0]])
    pde_mor = ADPDE(
        pde.domain,
        diff=lambda x, t, mu: np.broadcast_to(0.1 * mu[:, 0], (x.shape[0],)),
        vel=1.0,
        source=0.0,
        bcs=[0.0, 1.0],
        mor=MORVar(samples=samples),
    )
    fixed = build_fixed_data(pde_mor, disc_num=6)
    q = fixed.quad
    assert q.coords.shape == (5 * 3, 4, 2)  # (x, mu) inputs, 3 samples
    # block m holds mu = samples[m] and kappa = 0.1 * mu
    np.testing.assert_allclose(q.coords[:5, :, 1], 0.5)
    np.testing.assert_allclose(q.coords[5:10, :, 1], 1.0)
    np.testing.assert_allclose(q.kappa[10:], 0.2)
    assert fixed.static.n_inputs == 2 and fixed.static.n_mor == 1
    # BC points paired with samples too
    assert fixed.bc.coords.shape == (2 * 3, 2)
