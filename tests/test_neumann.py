"""Neumann (flux) boundary conditions — beyond-reference (the reference
supports Dirichlet only, SURVEY.md §0 item 8): NeumannBC segments become
FluxData penalty rows (kappa-scaled outward normals precomputed), enforced
through the Adam loss AND the LM residual.

Keystone analogue: the flux residual of the EXACT solution's gradient at
the assembled points is zero by construction — it validates segment
normals, kappa evaluation, and data pairing jointly, no training."""

import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import (
    BoxDomain3D,
    Domain1D,
    PolygonDomain2D,
    RectangleDomain2D,
)
from varnet_tpu.problems.adpde import ADPDE, NeumannBC
from varnet_tpu.problems.analytic import (
    steady_ad_1d_neumann,
    steady_ad_2d_neumann,
)


def test_segment_normals_1d_and_box():
    d1 = Domain1D(0.0, 2.0)
    np.testing.assert_allclose(d1.segment_normal(0), [-1.0])
    np.testing.assert_allclose(d1.segment_normal(1), [1.0])
    box = BoxDomain3D()
    np.testing.assert_allclose(box.segment_normal(0), [-1, 0, 0])
    np.testing.assert_allclose(box.segment_normal(1), [1, 0, 0])
    np.testing.assert_allclose(box.segment_normal(4), [0, 0, -1])
    np.testing.assert_allclose(box.segment_normal(5), [0, 0, 1])


@pytest.mark.parametrize("flip", [False, True], ids=["ccw", "cw"])
def test_segment_normals_polygon_orientation(flip):
    """Edge normals point OUTWARD for both vertex orientations."""
    verts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    if flip:
        verts = verts[::-1].copy()
    poly = PolygonDomain2D(verts)
    for seg in range(4):
        v = poly.vertices
        a, b = v[seg], v[(seg + 1) % 4]
        mid = (a + b) / 2.0
        n = poly.segment_normal(seg)
        np.testing.assert_allclose(np.linalg.norm(n), 1.0)
        # stepping outward must LEAVE the square
        assert not poly.in_domain((mid + 0.01 * n)[None, :])[0], (seg, n)
        assert poly.in_domain((mid - 0.01 * n)[None, :])[0], (seg, n)


def test_pure_neumann_rejected():
    with pytest.raises(ValueError, match="Dirichlet"):
        ADPDE(Domain1D(0, 1), diff=0.1, vel=1.0,
              bcs=[NeumannBC(0.0), NeumannBC(1.0)])


@pytest.mark.parametrize("case_fn,disc,kw", [
    (steady_ad_1d_neumann, 16, dict()),
    (steady_ad_2d_neumann, 8, dict(b_disc_num=6)),
])
def test_flux_residual_of_exact_is_zero(case_fn, disc, kw):
    """dirs . grad(c_ex) - g == 0 at every assembled flux point: pins the
    normal direction, the kappa scaling, and the value pairing."""
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    assert fd.neu is not None and fd.static.n_neu > 0
    pts = fd.neu.coords[:, : case["pde"].dim]
    g_ex = case["c_ex_grad"](pts)
    flux = np.einsum("nd,nd->n", fd.neu.dirs, g_ex)
    np.testing.assert_allclose(
        (flux - fd.neu.values) * fd.neu.mask, 0.0, atol=1e-12
    )


def test_dirichlet_only_has_no_flux_data():
    from varnet_tpu.problems.analytic import steady_ad_1d

    fd = build_fixed_data(steady_ad_1d()["pde"], 10)
    assert fd.neu is None and fd.static.n_neu == 0


@pytest.mark.slow
def test_neumann_1d_end_to_end_adam_and_lm():
    """Manufactured 1-D mixed problem converges through BOTH optimizers
    (measured: Adam 6.4e-3 at 2000 epochs, LM 3.0e-5 after 30 iters)."""
    case = steady_ad_1d_neumann()
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=16, n_devices=1)
    vn.train(epoch_num=2000, weight=(1.0, 10.0), save_freq=500,
             verbose=False)
    r = vn.refine_lm(steps=30, weight=(1.0, 10.0), cg_iters=40,
                     save_freq=10, verbose=False, matmul_precision=None)
    assert r.best_error() < 1e-3, r.best_error()


@pytest.mark.slow
def test_neumann_2d_sharded_matches_single_device():
    """Flux rows shard over the data axis like the other penalty points:
    first-step loss identical (f32 order), trajectory within the Adam
    amplification band."""
    case = steady_ad_2d_neumann()

    def run(nd):
        vn = VarNet(case["pde"], layer_width=(10, 10), disc_num=8,
                    b_disc_num=8, n_devices=nd, seed=4)
        r = vn.train(epoch_num=25, weight=(1.0, 10.0), save_freq=1,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    l8, l1 = run(8), run(1)
    np.testing.assert_allclose(l8[0], l1[0], rtol=1e-5)
    np.testing.assert_allclose(l8, l1, rtol=3e-2)


def test_neumann_2d_short_train_improves():
    """2-D mixed BC problem trains (loss decreases, flux aux present)."""
    case = steady_ad_2d_neumann()
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=8,
                b_disc_num=8, n_devices=1)
    r = vn.train(epoch_num=400, weight=(1.0, 10.0), save_freq=100,
                 verbose=False)
    assert r.losses[-1]["loss"] < r.losses[0]["loss"]


def test_flux_residual_of_exact_transient():
    """TRANSIENT Neumann keystone: flux points carry a time column and a
    time-varying kappa; dirs . grad(c_ex)(x, t) - g(x, t) must still be
    identically zero (pins the t-column pairing and kappa(x, t) eval)."""
    k3 = np.pi / 3.0

    def c_ex(x, t):
        x = np.atleast_2d(x)
        return np.sin(k3 * x[:, 0]) * np.exp(-np.asarray(t))

    def c_ex_grad(x, t):
        x = np.atleast_2d(x)
        return (k3 * np.cos(k3 * x[:, 0]) * np.exp(-np.asarray(t)))[:, None]

    def kappa(x, t):
        return 0.2 + 0.1 * np.asarray(t)

    def flux_right(x, t):
        x = np.atleast_2d(x)
        return kappa(x, t) * c_ex_grad(x, t)[:, 0]

    def source(x, t):
        x2 = np.atleast_2d(x)[:, 0]
        e = np.exp(-np.asarray(t))
        u = np.sin(k3 * x2) * e
        return -u + kappa(x, t) * k3**2 * u + 1.0 * c_ex_grad(x, t)[:, 0]

    pde = ADPDE(Domain1D(0.0, 1.0), diff=kappa, vel=1.0, source=source,
                t_interval=(0.0, 0.5), ic=lambda x: c_ex(x, 0.0),
                bcs=[0.0, NeumannBC(flux_right)], c_ex=c_ex)
    fd = build_fixed_data(pde, 10, t_disc_num=5)
    assert fd.neu is not None
    d = 1
    pts = fd.neu.coords[:, :d]
    ts = fd.neu.coords[:, d]
    flux = np.einsum("nd,nd->n", fd.neu.dirs, c_ex_grad(pts, ts))
    np.testing.assert_allclose(
        (flux - fd.neu.values) * fd.neu.mask, 0.0, atol=1e-12
    )
    # and the full transient train step runs with flux rows present
    vn = VarNet(pde, layer_width=(10, 10), disc_num=8, t_disc_num=4,
                n_devices=1)
    r = vn.train(epoch_num=150, weight=(1.0, 10.0, 10.0), save_freq=75,
                 verbose=False)
    assert r.losses[-1]["loss"] < r.losses[0]["loss"]


@pytest.mark.slow
def test_robin_keystone_and_e2e():
    """RobinBC (alpha u + kappa du/dn = g): assembled alpha lands in
    FluxData, the keystone residual of the exact solution vanishes, and
    the mixed Dirichlet/Robin problem converges through Adam + LM."""
    from varnet_tpu.problems.adpde import RobinBC

    kappa, v, a = 0.2, 1.0, 1.5
    k3 = np.pi / 3.0

    def c_ex(x, t=None):
        x = np.atleast_2d(x)
        return np.sin(k3 * x[:, 0])

    def c_ex_grad(x, t=None):
        x = np.atleast_2d(x)
        return (k3 * np.cos(k3 * x[:, 0]))[:, None]

    def source(x, t=None):
        x = np.atleast_2d(x)[:, 0]
        return kappa * k3**2 * np.sin(k3 * x) + v * k3 * np.cos(k3 * x)

    g_right = float(a * np.sin(k3) + kappa * k3 * np.cos(k3))
    pde = ADPDE(Domain1D(0.0, 1.0), diff=kappa, vel=v, source=source,
                bcs=[0.0, RobinBC(alpha=a, flux=g_right)], c_ex=c_ex)
    fd = build_fixed_data(pde, 14)
    assert fd.neu is not None
    np.testing.assert_allclose(fd.neu.alpha, a)
    flux = (np.einsum("nd,nd->n", fd.neu.dirs,
                      c_ex_grad(fd.neu.coords[:, :1]))
            + fd.neu.alpha * c_ex(fd.neu.coords[:, :1]))
    np.testing.assert_allclose(
        (flux - fd.neu.values) * fd.neu.mask, 0.0, atol=1e-12
    )

    vn = VarNet(pde, layer_width=(16, 16), disc_num=16, n_devices=1)
    vn.train(epoch_num=1500, weight=(1.0, 10.0), save_freq=500,
             verbose=False)
    r = vn.refine_lm(steps=30, weight=(1.0, 10.0), cg_iters=40,
                     save_freq=10, verbose=False, matmul_precision=None)
    assert r.best_error() < 1e-3, r.best_error()


def test_neumann_mor_pairing():
    """MOR x Neumann composition: flux points pair with the mu samples
    (sample index slowest) and the keystone still vanishes when g
    depends on mu."""
    from varnet_tpu.problems.adpde import MORVar

    kappa = 0.2
    k3 = np.pi / 3.0

    def c_ex(x, t=None, mu=None):
        x = np.atleast_2d(x)
        amp = 1.0 if mu is None else mu[:, 0]
        return amp * np.sin(k3 * x[:, 0])

    def grad_mu(x, mu):
        return (mu[:, 0] * k3 * np.cos(k3 * np.atleast_2d(x)[:, 0]))[:, None]

    def flux_right(x, t, mu):
        return kappa * grad_mu(x, mu)[:, 0]

    pde = ADPDE(Domain1D(0.0, 1.0), diff=kappa, vel=1.0, source=0.0,
                bcs=[0.0, NeumannBC(flux_right)],
                mor=MORVar(np.array([[0.5], [2.0]])), c_ex=c_ex)
    fd = build_fixed_data(pde, 10)
    assert fd.neu is not None
    d = 1
    pts = fd.neu.coords[:, :d]
    mus = fd.neu.coords[:, d:]
    flux = np.einsum("nd,nd->n", fd.neu.dirs, grad_mu(pts, mus))
    np.testing.assert_allclose(
        (flux - fd.neu.values) * fd.neu.mask, 0.0, atol=1e-12
    )
