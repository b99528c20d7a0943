"""Exact (hard-constraint) BC/IC imposition — fem/hardbc.py.

Beyond-reference capability (the reference is penalty-only, SURVEY.md §0
item 5): the ansatz u = G + tau D net must (a) satisfy the Dirichlet data
and IC EXACTLY for any parameters, (b) carry model-consistent derivatives
through the weak residual (checked against finite differences of the
composed evaluation), and (c) train end-to-end through Adam and LM with
the BC/IC penalty rows gone.
"""

import warnings

import jax
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.hardbc import HardBC
from varnet_tpu.geometry.domain import (
    BoxDomain3D,
    Domain1D,
    PolygonDomain2D,
    RectangleDomain2D,
)
from varnet_tpu.problems.adpde import ADPDE, NeumannBC
from varnet_tpu.problems.analytic import (
    steady_ad_1d,
    steady_ad_2d,
    transient_ad_1d,
    transient_ad_3d,
)


# --------------------------------------------------------------------- #
# builder units


def _interior_samples(domain, n=200, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = domain.bounds
    lo, hi = np.atleast_1d(lo), np.atleast_1d(hi)
    pts = lo + rng.random((4 * n, lo.shape[0])) * (hi - lo)
    pts = pts[domain.in_domain(pts)][:n]
    assert pts.shape[0] > 0
    return pts


@pytest.mark.parametrize(
    "make",
    [
        lambda: (Domain1D(0.0, 2.0), [0.0, 1.0]),
        lambda: (RectangleDomain2D((0.0, 0.0), (2.0, 1.0)), 0.0),
        lambda: (BoxDomain3D(), 0.0),
        lambda: (
            PolygonDomain2D(np.array([[0.0, 0.0], [2.0, 0.0], [1.5, 1.5],
                                      [0.0, 1.0]])),
            0.0,
        ),
    ],
    ids=["interval", "rectangle", "box3d", "convex_polygon"],
)
def test_adf_vanishes_on_boundary_positive_inside(make):
    domain, bcs = make()
    pde = ADPDE(domain, diff=0.1, vel=np.zeros(domain.dim), bcs=bcs)
    hb = HardBC(pde)
    for seg_pts in domain.boundary_points(7):
        np.testing.assert_allclose(hb.dist(seg_pts), 0.0, atol=1e-12)
    assert (hb.dist(_interior_samples(domain)) > 0).all()


def test_free_segment_keeps_adf_positive():
    """A None (free) segment carries no distance factor: D > 0 there."""
    domain = RectangleDomain2D((0.0, 0.0), (1.0, 1.0))
    pde = ADPDE(domain, diff=0.1, vel=(0.0, 0.0),
                bcs=[0.0, None, 0.0, 0.0])
    hb = HardBC(pde)
    right = domain.boundary_points(9)[1][1:]  # skip the owned corner
    assert (hb.dist(right) > 1e-6).all()
    np.testing.assert_allclose(
        hb.dist(domain.boundary_points(9)[0]), 0.0, atol=1e-12
    )


def test_gtilde_matches_segment_data():
    """Distinct per-edge Dirichlet fields: the blend equals each g_e on
    its own edge, including at (compatible-data) corners."""
    domain = RectangleDomain2D((0.0, 0.0), (1.0, 1.0))
    # g(x, y) = x + 2y restricted per edge -> globally continuous data
    g = lambda x: x[:, 0] + 2.0 * x[:, 1]  # noqa: E731
    bcs = [lambda x: g(np.atleast_2d(x)) for _ in range(4)]
    pde = ADPDE(domain, diff=0.1, vel=(0.0, 0.0), bcs=bcs)
    hb = HardBC(pde)
    assert not hb._single_g
    for seg_pts in domain.boundary_points(11):
        np.testing.assert_allclose(
            hb.gtilde(seg_pts, None), g(seg_pts), atol=1e-9
        )
    # corner values exact despite the IDW 0/0 limit
    corners = domain.vertices
    np.testing.assert_allclose(
        hb.gtilde(corners, None), g(corners), atol=1e-9
    )


def test_nonconvex_polygon_segment_adf():
    """L-shape (non-convex): the trimmed segment ADFs vanish on every
    edge but stay positive at interior points that lie on an edge LINE's
    extension — the case plane distances get wrong."""
    lshape = PolygonDomain2D(np.array([
        [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [1.0, 2.0],
        [1.0, 1.0], [0.0, 1.0],
    ]))
    hb = HardBC(ADPDE(lshape, diff=0.1, vel=(0.0, 0.0), bcs=0.0))
    for seg_pts in lshape.boundary_points(9):
        np.testing.assert_allclose(hb.dist(seg_pts), 0.0, atol=1e-12)
    # interior points on the extensions of the reentrant edges
    # (x = 1 below y = 1; y = 1 right of x = 1) must keep D > 0
    probes = np.array([[1.0, 0.5], [1.5, 1.0], [0.5, 0.5], [1.5, 0.5]])
    assert (hb.dist(probes) > 1e-4).all(), hb.dist(probes)
    assert (hb.dist(_interior_samples(lshape)) > 0).all()


def test_mor_exactness_mu_dependent_data():
    """MOR composition with mu-DEPENDENT boundary data: for a random
    (untrained) network the ansatz reproduces g(x, mu) exactly on every
    segment for EVERY training sample (the G tables tile per sample via
    the paired coords)."""
    from varnet_tpu.problems.analytic import mor_steady_ad_2d

    case = mor_steady_ad_2d()
    pde = case["pde"]
    vn = VarNet(pde, layer_width=(10,), disc_num=6, n_devices=1,
                hard_bc=True, seed=4)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.6
    for row in pde.mor.samples:
        for seg, pts in enumerate(pde.domain.boundary_points(7)):
            mu = np.broadcast_to(row[None, :], (pts.shape[0], row.shape[0]))
            u = vn.evaluate(pts, mu=row)
            g = pde.eval_bc(seg, pts, None, mu)
            np.testing.assert_allclose(u, g, atol=5e-6)


@pytest.mark.slow
def test_mor_hard_bc_trains():
    """Hard BC x MOR end-to-end on the HOMOGENEOUS parametric family
    (no data leakage — g = 0): BC rows report exactly 0, training + LM
    reach a per-sample rel-L2 well under the untrained scale, and the
    boundary stays exact for every mu."""
    from varnet_tpu.problems.analytic import mor_steady_ad_2d_hom
    from varnet_tpu.utils.helpers import rel_l2_error

    case = mor_steady_ad_2d_hom(vels=(0.5, 1.5))
    pde = case["pde"]
    vn = VarNet(pde, layer_width=(16, 16), disc_num=10, n_devices=1,
                hard_bc=True, seed=0)
    res = vn.train(epoch_num=500, save_freq=250, verbose=False,
                   error_disc=24)
    assert res.losses[-1]["loss_bc"] == 0.0
    r = vn.refine_lm(steps=6, cg_iters=40, save_freq=6, verbose=False,
                     error_disc=24)
    pts, mask = pde.domain.grid_in_domain((25, 25))
    pts = pts[mask]
    for row in pde.mor.samples:
        mu = np.broadcast_to(row[None, :], (pts.shape[0], row.shape[0]))
        err = rel_l2_error(vn.evaluate(pts, mu=row),
                           case["c_ex"](pts, None, mu))
        assert err < 5e-2, (float(row[0]), err, r.errors)
        bpts = pde.domain.boundary_points(6)[0]
        np.testing.assert_allclose(vn.evaluate(bpts, mu=row), 0.0,
                                   atol=5e-6)


def test_flux_segment_unconstrained():
    """Neumann/Robin segments carry no distance factor (the flux stays a
    penalty on the transformed solution): D > 0 on the flux end, 0 on
    the Dirichlet end."""
    pde = ADPDE(Domain1D(), diff=0.1, vel=1.0,
                bcs=[0.0, NeumannBC(flux=1.0)])
    hb = HardBC(pde)
    assert hb.dist(np.array([[1.0]]))[0] > 0.1
    np.testing.assert_allclose(hb.dist(np.array([[0.0]])), 0.0, atol=1e-12)


@pytest.mark.slow
def test_mixed_hard_dirichlet_penalty_neumann_trains():
    """Mixed problem (config: steady_ad_1d_neumann): the Dirichlet end is
    exact by ansatz, the Neumann end trains as a penalty on the
    TRANSFORMED flux, and Adam + LM reach the manufactured solution."""
    from varnet_tpu.problems.analytic import steady_ad_1d_neumann

    case = steady_ad_1d_neumann()
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=12,
                n_devices=1, hard_bc=True, seed=0)
    res = vn.train(epoch_num=800, weight=(1.0, 10.0), save_freq=400,
                   verbose=False, error_disc=64)
    assert res.losses[-1]["loss_bc"] == 0.0
    assert res.losses[-1]["loss_neu"] > 0.0  # flux penalty is live
    r = vn.refine_lm(steps=10, weight=(1.0, 10.0), cg_iters=60,
                     save_freq=10, verbose=False, error_disc=64)
    assert r.errors[-1] < 1e-3, (res.errors, r.errors)
    np.testing.assert_allclose(vn.evaluate(np.array([[0.0]])), 0.0,
                               atol=5e-6)
    # flux at the Neumann end approaches its manufactured value
    g = vn.evaluate_grad(np.array([[1.0]]))
    flux = 0.2 * g["grad"][0, 0]
    np.testing.assert_allclose(flux, 0.2 * np.pi / 3 * np.cos(np.pi / 3),
                               rtol=2e-2)


def test_incompatible_data_warns():
    domain = Domain1D()
    pde = ADPDE(domain, diff=0.1, vel=1.0, t_interval=(0.0, 1.0),
                bcs=[1.0, 0.0], ic=0.0)  # u0 = 0 but g(0, t) = 1
    with pytest.warns(UserWarning, match="incompatible"):
        HardBC(pde)


# --------------------------------------------------------------------- #
# ansatz exactness + derivative consistency through VarNet


def test_exactness_random_theta_transient():
    """For a RANDOM (untrained) network, evaluate() reproduces the BC on
    the boundary at every time and the IC at t = 0 exactly."""
    case = transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=8, t_disc_num=4,
                n_devices=1, hard_bc=True, seed=3)
    # bump the zero-initialized output layer: exactness must hold for ANY
    # parameters, not just net == 0
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.5
    dom = case["pde"].domain
    for seg, pts in enumerate(dom.boundary_points()):
        for tv in (0.0, 0.17, 0.5):
            u = vn.evaluate(pts, t=np.full(pts.shape[0], tv))
            g = case["pde"].eval_bc(seg, pts, np.full(pts.shape[0], tv))
            np.testing.assert_allclose(u, g, atol=5e-6)
    xs = np.linspace(0.0, 1.0, 41)[:, None]
    u0 = vn.evaluate(xs, t=np.zeros(41))
    np.testing.assert_allclose(u0, case["pde"].eval_ic(xs), atol=5e-6)


def test_exactness_random_theta_steady_2d():
    case = steady_ad_2d()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=6, n_devices=1,
                hard_bc=True, seed=5)
    dom = case["pde"].domain
    # perturb the (zero-initialized) output layer so the raw net is
    # nonzero — exactness must hold for ANY parameters
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.7
    for pts in dom.boundary_points(9):
        np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)
    # interior values are NOT pinned (the net contributes through D > 0)
    mid = np.array([[0.5, 0.5]])
    assert abs(vn.evaluate(mid)[0]) > 1e-3


def test_evaluate_grad_consistent_with_fd():
    """The transformed gradient tables (dA/dB chain) agree with central
    differences of the composed evaluate() — the same consistency the
    weak residual relies on."""
    case = transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=8, t_disc_num=4,
                n_devices=1, hard_bc=True, seed=1)
    x = np.linspace(0.15, 0.85, 9)[:, None]
    t = np.linspace(0.1, 0.4, 9)
    out = vn.evaluate_grad(x, t=t)
    h = 1e-4
    gx = (vn.evaluate(x + h, t=t) - vn.evaluate(x - h, t=t)) / (2 * h)
    gt = (vn.evaluate(x, t=t + h) - vn.evaluate(x, t=t - h)) / (2 * h)
    np.testing.assert_allclose(out["grad"][:, 0], gx, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(out["u_t"], gt, rtol=2e-3, atol=2e-4)


# --------------------------------------------------------------------- #
# end-to-end training


@pytest.mark.slow
def test_train_1d_steady_hard_bc():
    """Hard-constrained training on config 1: no BC rows in the loss
    (reported exactly 0.0) and Adam + LM converges.  The pe = 10
    boundary layer is hard mode's measured WORST case (the ansatz
    concentrates a residual-invisible error mode in the outflow layer —
    floor ~6.5e-3 at this mesh, vs ~2e-3 penalty; smooth/transient cases
    below beat penalty by 10-100x), so the bound here is loose."""
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=12,
                n_devices=1, hard_bc=True, seed=0)
    res = vn.train(epoch_num=800, save_freq=400, verbose=False,
                   error_disc=64)
    assert res.losses[-1]["loss_bc"] == 0.0
    r = vn.refine_lm(steps=8, cg_iters=40, save_freq=8, verbose=False,
                     error_disc=64)
    assert min(res.errors[-1], r.errors[-1]) < 1e-2


@pytest.mark.slow
def test_train_1d_transient_hard_bc_beats_north_star():
    """Transient 1-D (config 2): hard mode reaches < 1e-3 in a budget
    where penalty training sits at ~6e-2 (measured A/B) — the headline
    win of exact imposition."""
    case = transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=12,
                t_disc_num=8, n_devices=1, hard_bc=True, seed=0)
    vn.train(epoch_num=600, save_freq=600, verbose=False,
             error_disc=48, error_times=3)
    r = vn.refine_lm(steps=10, cg_iters=60, save_freq=10, verbose=False,
                     error_disc=48, error_times=3)
    assert r.errors[-1] < 1e-3, r.errors


def test_train_transient_sharded_equivalence():
    """Sharded (8-device) vs single-device hard-BC training agrees —
    the transform tables shard with the quad rows."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    case = transient_ad_1d()
    losses = {}
    for nd in (1, 8):
        vn = VarNet(case["pde"], layer_width=(10,), disc_num=8,
                    t_disc_num=4, n_devices=nd, hard_bc=True, seed=0)
        res = vn.train(epoch_num=5, save_freq=5, verbose=False,
                       error_disc=16, error_times=3)
        losses[nd] = res.losses[-1]["loss"]
    np.testing.assert_allclose(losses[8], losses[1], rtol=2e-4)


@pytest.mark.slow
def test_lm_loss_matches_train_loss():
    """The LM residual vector reproduces the training loss in hard mode
    (sum r^2 == loss with unit weights), pinning the two paths to one
    objective."""
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=10, n_devices=1,
                hard_bc=True, seed=2)
    res = vn.train(epoch_num=3, save_freq=3, verbose=False, error_disc=16)
    r = vn.refine_lm(steps=1, cg_iters=2, save_freq=1, verbose=False,
                     error_disc=16)
    # refine_lm's initial loss (before its first accepted step) equals the
    # training loss at the same theta: compare orders of magnitude only —
    # one more Adam step separates them.
    assert np.isfinite(r.losses[-1]["loss"])
    assert r.losses[-1]["loss"] <= res.losses[-1]["loss"] * 1.5


def test_hard_beats_penalty_at_matched_budget():
    """The headline claim measured: at a small fixed Adam budget the
    exact-BC ansatz reaches a lower rel-L2 than penalty training on the
    nonhomogeneous-BC 1-D boundary layer (no BC/interior balance to
    learn)."""
    case = steady_ad_1d(kappa=0.1)
    errs = {}
    for mode in ("hard", "penalty"):
        vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=12,
                    n_devices=1, hard_bc=(mode == "hard"), seed=0)
        res = vn.train(epoch_num=600, save_freq=600, verbose=False,
                       error_disc=64)
        errs[mode] = res.errors[-1]
    assert errs["hard"] < errs["penalty"], errs


def test_lshape_hard_bc_trains():
    """Full pipeline over the trimmed segment ADFs: a source-driven
    L-shape problem (zero Dirichlet everywhere) trains, the loss
    decreases, and the boundary stays exactly zero."""
    lshape = PolygonDomain2D(np.array([
        [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [1.0, 2.0],
        [1.0, 1.0], [0.0, 1.0],
    ]))
    pde = ADPDE(lshape, diff=0.2, vel=(0.5, 0.0), source=1.0, bcs=0.0)
    vn = VarNet(pde, layer_width=(12, 12), disc_num=10, n_devices=1,
                hard_bc=True, seed=0)
    res = vn.train(epoch_num=150, save_freq=50, verbose=False)
    losses = [rec["loss"] for rec in res.losses]
    assert losses[-1] < losses[0] * 0.5, losses
    for pts in lshape.boundary_points(7):
        np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)
    # the solution is genuinely nonzero inside
    assert abs(vn.evaluate(np.array([[0.5, 0.5]]))[0]) > 1e-3


def test_ensemble_with_hard_bc():
    """Hard-BC tables are member-independent: a small vmapped ensemble
    trains, each member's BC stays exact."""
    case = steady_ad_2d()
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=6, n_devices=1,
                hard_bc=True, seed=0)
    res = vn.train_ensemble(epoch_num=30, n_members=2, save_freq=30,
                            verbose=False, error_disc=24)
    assert res.n_members == 2
    assert all(np.isfinite(v) for v in res.member_losses[-1])
    pts = case["pde"].domain.boundary_points(5)[0]
    np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)


def test_evaluate_chunked_matches_unchunked():
    """The chunked evaluation path applies the SAME host-side transform
    as the single-shot path (padding tails must not leak)."""
    case = transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=8, t_disc_num=4,
                n_devices=1, hard_bc=True, seed=2)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.3
    x = np.linspace(0.0, 1.0, 53)[:, None]
    t = np.linspace(0.0, 0.5, 53)
    np.testing.assert_allclose(
        vn.evaluate(x, t=t, chunk=16), vn.evaluate(x, t=t), rtol=1e-6
    )


def test_adaptive_refinement_with_hard_bc():
    """refine_tests composes with hard_bc: the residual diagnostic sees
    the TRANSFORMED solution, the refined quad rebuilds the transform
    tables at the new coords (they are derived from self.fixed on every
    train call), and the enlarged problem keeps the boundary exact."""
    case = steady_ad_2d()
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=8,
                n_devices=1, hard_bc=True, seed=0)
    vn.train(epoch_num=120, save_freq=60, verbose=False)
    k0 = vn.fixed.quad.coords.shape[0]
    info = vn.refine_tests(frac=0.2, verbose=False)
    assert info["n_added"] > 0
    assert vn.fixed.quad.coords.shape[0] > k0
    res = vn.train(epoch_num=120, save_freq=60, verbose=False)
    assert np.isfinite(res.losses[-1]["loss"])
    assert res.losses[-1]["loss_bc"] == 0.0
    for pts in case["pde"].domain.boundary_points(5):
        np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)


@pytest.mark.slow
def test_batched_hard_bc_matches_single_device():
    """batch_num > 1 composes with hard_bc: the transform tables scan
    with the quad mini-batches ([B, Kb, ...] — trainer body), and the
    4-device run reproduces the 1-device loss history (pins the batched
    hard sharding spec).  Transient case so the At/Bt scan slots are
    exercised."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    case = transient_ad_1d()

    def run(nd):
        vn = VarNet(case["pde"], layer_width=(10,), disc_num=9,
                    t_disc_num=5, n_devices=nd, hard_bc=True, seed=0)
        r = vn.train(epoch_num=20, batch_num=2, save_freq=10,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    np.testing.assert_allclose(run(4), run(1), rtol=2e-4)


@pytest.mark.slow
def test_batched_partition_device_count_invariant():
    """Mini-batch MEMBERSHIP no longer depends on n_devices (VERDICT r3
    item 6): K = 45 tests is NOT divisible by batch_num * n_shards for
    either device count — under the old global pad-to-(B x n_shards)
    scheme the batch boundary shifted with the device count and the two
    runs optimized different partitions (measured 0.35% loss divergence
    at epoch 1).  Now the split is fixed by batch_num alone and shard
    padding is per-batch masked filler, so the histories agree to float
    tolerance."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    case = transient_ad_1d()

    def run(nd):
        vn = VarNet(case["pde"], layer_width=(10,), disc_num=10,
                    t_disc_num=6, n_devices=nd, seed=0)
        assert vn.static.n_test == 45  # 9 * 5, not divisible by 2*4
        r = vn.train(epoch_num=20, batch_num=2, save_freq=10,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    np.testing.assert_allclose(run(4), run(1), rtol=2e-4)


def test_batched_hard_bc_trains_and_stays_exact():
    """Mini-batched hard-BC training decreases the loss, reports the BC
    rows as exactly 0, and keeps the boundary exact."""
    case = steady_ad_2d()
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=8,
                n_devices=1, hard_bc=True, seed=0)
    res = vn.train(epoch_num=200, batch_num=2, save_freq=100,
                   verbose=False)
    losses = [rec["loss"] for rec in res.losses]
    assert losses[-1] < losses[0] * 0.8, losses
    assert res.losses[-1]["loss_bc"] == 0.0
    for pts in case["pde"].domain.boundary_points(5):
        np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)


def test_order2_hard_bc_trains_and_stays_exact():
    """Composition: quadratic (order-2) test space x hard imposition.
    The per-node [K, nQ] tables and the hard transform tables are
    independent axes of the same quad layout; training must converge
    with the BC rows gone and the boundary exact."""
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=12,
                test_order=2, n_devices=1, hard_bc=True, seed=0)
    res = vn.train(epoch_num=800, save_freq=400, verbose=False,
                   error_disc=64)
    assert res.losses[-1]["loss_bc"] == 0.0
    assert res.errors[-1] < 5e-2, res.errors
    lo, hi = case["pde"].domain.bounds
    u = vn.evaluate(np.array([[lo], [hi]], np.float64))
    g = [case["c_ex"](np.array([[lo]]))[0], case["c_ex"](np.array([[hi]]))[0]]
    np.testing.assert_allclose(u, g, atol=5e-6)


@pytest.mark.slow
def test_burgers_hard_bc_trains_to_front():
    """Composition: nonlinear advection x hard imposition.  The bilinear
    u (b.grad u) term must see the TRANSFORMED solution u = G + tau D net
    (a raw-net nonlinear term would converge to the wrong front shape —
    the rel-L2 bound catches that), with the boundary exact."""
    from varnet_tpu.problems.analytic import burgers_1d_steady

    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(20, 20), disc_num=24, seed=1,
                n_devices=1, hard_bc=True)
    res = vn.train(epoch_num=1500, weight=(1.0, 10.0), save_freq=500,
                   verbose=False, matmul_precision="highest")
    assert res.losses[-1]["loss_bc"] == 0.0
    # the standing-shock front position is exponentially weakly
    # determined (DESIGN.md 16) — Adam wanders, LM pins it (measured
    # here: Adam ~0.11, +LM 7e-3)
    vn.refine_lm(steps=8, weight=(1.0, 10.0), cg_iters=60, save_freq=8,
                 verbose=False, matmul_precision="highest")
    x = np.linspace(0, 1, 101)[:, None]
    u = vn.evaluate(x)
    rel = np.linalg.norm(u - case["c_ex"](x)) / np.linalg.norm(case["c_ex"](x))
    assert rel < 0.05, rel
    lo, hi = case["pde"].domain.bounds
    ub = vn.evaluate(np.array([[lo], [hi]], np.float64))
    gb = [case["c_ex"](np.array([[lo]]))[0], case["c_ex"](np.array([[hi]]))[0]]
    np.testing.assert_allclose(ub, gb, atol=5e-6)


def test_inverse_diffusivity_hard_bc_recovers():
    """Composition: trainable diffusivity x hard imposition.  The obs
    rows see the transformed field, the BC rows are gone, and the
    joint {net, kappa} optimization still identifies the coefficient
    from interior observations."""
    import jax.numpy as jnp

    from varnet_tpu.fem.assembly import PointData

    kappa_true = 0.08

    def softplus_kappa(psi, x, t):
        return jnp.full((x.shape[0],), jnp.logaddexp(psi[0], 0.0))

    case = steady_ad_1d(kappa=kappa_true)
    xs = np.linspace(0.05, 0.95, 25)[:, None]
    obs = PointData(coords=xs.astype(np.float32),
                    values=case["c_ex"](xs).astype(np.float32),
                    mask=np.ones(len(xs), np.float32))
    psi0 = np.array([np.log(np.expm1(0.03))], np.float64)  # kappa0 = 0.03
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=24, seed=1,
                diff_fn=softplus_kappa, diff_init=psi0, obs_data=obs,
                n_devices=1, hard_bc=True)
    res = vn.train(epoch_num=3000, weight=(1.0, 10.0, 10.0), save_freq=1000,
                   verbose=False, matmul_precision="highest")
    assert res.losses[-1]["loss_bc"] == 0.0
    k = float(np.logaddexp(np.asarray(vn.theta["kap"])[0], 0.0))
    assert abs(k - kappa_true) / kappa_true < 0.25, k


def test_exactness_random_theta_transient_3d():
    """Hard BC on the 3-D TRANSIENT case (4-D space-time test classes):
    a random network reproduces the zero Dirichlet data at every time and
    the sin-product IC at t = 0 exactly — the composition the hardbc_tpu
    `3dt` benchmark case rides."""
    case = transient_ad_3d()
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=4, t_disc_num=3,
                n_devices=1, hard_bc=True, seed=7)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.6
    dom = case["pde"].domain
    for pts in dom.boundary_points(4):
        for tv in (0.0, 0.21, 0.5):
            u = vn.evaluate(pts, t=np.full(pts.shape[0], tv))
            np.testing.assert_allclose(u, 0.0, atol=5e-6)
    rng = np.random.default_rng(0)
    xs = rng.random((64, 3))
    u0 = vn.evaluate(xs, t=np.zeros(64))
    np.testing.assert_allclose(u0, case["pde"].eval_ic(xs), atol=5e-6)


@pytest.mark.slow
def test_train_transient_3d_hard_bc():
    """Hard-constrained training runs end-to-end (Adam + one LM step) on
    the 3-D transient case: BC and IC loss rows both report exactly 0.0
    and the error improves from the random init."""
    case = transient_ad_3d()
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=4, t_disc_num=3,
                n_devices=1, hard_bc=True, seed=0)
    res = vn.train(epoch_num=120, save_freq=60, verbose=False,
                   error_disc=8, error_times=3)
    assert res.losses[-1]["loss_bc"] == 0.0
    assert res.losses[-1]["loss_ic"] == 0.0
    r = vn.refine_lm(steps=2, cg_iters=20, save_freq=2, verbose=False,
                     error_disc=8, error_times=3)
    assert min(res.errors + r.errors) < res.errors[0]


def test_gtilde_many_segment_idw_no_underflow():
    """The IDW product-of-distances underflows exp() without the
    logsumexp-style shift once E is a few hundred segments (review
    finding, round 3): a 720-gon with g = 1 everywhere must blend to
    finite weights that reproduce the constant."""
    th = np.linspace(0.0, 2 * np.pi, 720, endpoint=False)
    poly = PolygonDomain2D(np.stack([np.cos(th), np.sin(th)], axis=1))
    pde = ADPDE(poly, diff=0.1, vel=(0.0, 0.0),
                bcs=[1.0] * poly.n_boundary_segments)
    hb = HardBC(pde)
    pts = np.array([[0.0, 0.0], [0.3, 0.2], [-0.5, 0.1], [0.0, 0.9]])
    g = hb.gtilde(pts, None)
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g, 1.0, atol=1e-9)


def test_tables_one_sided_fallback_at_boundary_points():
    """tables() is also called at flux-penalty coords ON the boundary
    (api._shard_hard); a user data callable undefined outside the domain
    (sqrt) must not NaN the dA rows (review finding, round 3)."""

    def g_sqrt(x, t):
        x = np.atleast_2d(x)
        return np.sqrt(x[:, 0]) + np.asarray(t)

    dom = RectangleDomain2D((0.0, 0.0), (1.0, 1.0))
    # bottom, right, top free; left (x0 = 0) Dirichlet with sqrt data
    pde = ADPDE(dom, diff=0.1, vel=(0.5, 0.0), source=0.0,
                bcs=[None, None, None, g_sqrt],
                t_interval=(0.0, 1.0), ic=lambda x: g_sqrt(x, 0.0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        hb = HardBC(pde)
    # points ON the left edge: the x0 - h probe leaves the domain
    ys = np.linspace(0.1, 0.9, 5)
    coords = np.stack([np.zeros(5), ys, np.full(5, 0.5)], axis=1)
    hq = hb.tables(coords)
    assert np.isfinite(hq.dA).all()
    assert np.isfinite(hq.At).all()
    # the one-sided d/dx of sqrt at x=0 is huge but finite; d/dy is 0
    np.testing.assert_allclose(hq.dA[:, 1], 0.0, atol=1e-6)
