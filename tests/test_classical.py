"""Validate the classical FDM reference solver itself.

The solver (problems/classical.py) is the independent ground truth for the
contaminant-transport cross-validation (SURVEY.md §4 item 2, VERDICT r1
missing #1), so it must first be proven on a problem with a closed form —
exactly what the reference's COMSOL comparison presumes of COMSOL.
"""

import numpy as np
import pytest

from varnet_tpu.problems.analytic import transient_ad_2d
from varnet_tpu.problems.classical import solve_ad_fdm_2d
from varnet_tpu.utils.helpers import rel_l2_error
from varnet_tpu.utils.io import load_theta_npz


def _fdm_error(nx, nt):
    case = transient_ad_2d()  # kappa=0.05, v=(0.5,0.25), all-Dirichlet
    pde = case["pde"]
    times = np.linspace(0.0, 0.5, 6)
    out = solve_ad_fdm_2d(pde, nx=nx, ny=nx, nt=nt, sample_times=times)
    errs = []
    for s, t in enumerate(out["times"]):
        exact = case["c_ex"](out["x"], np.full(out["x"].shape[0], t))
        errs.append((out["u"][s], exact))
    pred = np.concatenate([p for p, _ in errs])
    true = np.concatenate([e for _, e in errs])
    return rel_l2_error(pred, true)


def test_fdm_matches_analytic_solution():
    err = _fdm_error(nx=48, nt=96)
    assert err < 5e-3, f"FDM vs analytic rel-L2 {err:.2e}"


def test_fdm_second_order_convergence():
    e_coarse = _fdm_error(nx=24, nt=48)
    e_fine = _fdm_error(nx=48, nt=96)
    # CN + central differences: halving h and dt shrinks the error ~4x;
    # accept >2.5x to stay robust to the O(h^3) remainder terms.
    assert e_fine < e_coarse / 2.5, (e_coarse, e_fine)


def test_contaminant_inlet_theta_matches_fdm():
    """Pin the contaminant cross-validation (inlet variant — the validated
    one): the persisted TPU-trained parameters
    (benchmarks/contaminant_validation.py --variant inlet) re-score against
    the shipped FDM field, loaded through utils/io — the reference's
    FEM-data-comparison workflow (SURVEY.md §4 item 2).  Skips until the
    TPU run has persisted the theta.

    The volumetric-source variant is a DOCUMENTED limitation: u=0 is a
    quasi-minimum no tested optimizer/curriculum escapes, and a supervised
    fit of its field only reaches ~30% rel-L2 (see DESIGN.md 'zero-data
    attractor' + the measured numbers in contaminant_validation.json)."""
    import os

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_inlet_2d
    from varnet_tpu.utils.io import load_observations_csv

    base = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    theta_path = os.path.join(base, "results", "theta_contaminant_inlet.npz")
    if not os.path.exists(theta_path):
        pytest.skip("no persisted contaminant-inlet theta yet")
    theta = load_theta_npz(theta_path)
    obs = load_observations_csv(os.path.join(base, "data",
                                             "contaminant_inlet_fdm.csv"))
    m = obs.coords[:, 2] > 0
    case = contaminant_inlet_2d()
    vn = VarNet(case["pde"], layer_width=tuple(
        layer["b"].shape[0] for layer in theta[:-1]),
        disc_num=8, t_disc_num=4, n_devices=1)
    vn.theta = theta
    u = vn.evaluate(obs.coords[m, :2], t=obs.coords[m, 2])
    err = rel_l2_error(u, obs.values[m])
    assert err < 0.08, f"contaminant-inlet vs FDM regression: rel-L2 {err:.3f}"


def test_contaminant_inlet_hard_theta_matches_fdm():
    """Pin the hard-BC inlet run (queue10 2026-08-19: overall rel-L2
    1.08% vs 3.21% penalty — exact imposition 3x better on the same FDM
    field): the persisted theta re-scores through the CSV/io path with
    no training."""
    import os

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_inlet_2d
    from varnet_tpu.utils.io import load_observations_csv

    base = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    theta_path = os.path.join(base, "results",
                              "theta_contaminant_inlet_hard.npz")
    if not os.path.exists(theta_path):
        pytest.skip("no persisted hard-BC contaminant-inlet theta yet")
    theta = load_theta_npz(theta_path)
    obs = load_observations_csv(os.path.join(base, "data",
                                             "contaminant_inlet_fdm.csv"))
    m = obs.coords[:, 2] > 0
    case = contaminant_inlet_2d()
    vn = VarNet(case["pde"], layer_width=tuple(
        layer["b"].shape[0] for layer in theta[:-1]),
        disc_num=8, t_disc_num=4, n_devices=1, hard_bc=True)
    vn.theta = theta
    u = vn.evaluate(obs.coords[m, :2], t=obs.coords[m, 2])
    err = rel_l2_error(u, obs.values[m])
    assert err < 0.03, f"inlet-hard vs FDM regression: rel-L2 {err:.3f}"


def test_contaminant_source_ff_theta_matches_fdm():
    """Pin the source-driven contaminant cross-validation (Fourier-feature
    variant, kappa=0.03/sigma=0.12 — measured 2.25% overall): the
    zero-data attractor's FF escape, re-scored with no training."""
    import os

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_transport_2d
    from varnet_tpu.utils.io import load_observations_csv

    base = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    theta_path = os.path.join(base, "results", "theta_contaminant_src_ff.npz")
    if not os.path.exists(theta_path):
        pytest.skip("no persisted source-ff theta yet")
    theta = load_theta_npz(theta_path)
    obs = load_observations_csv(os.path.join(base, "data",
                                             "contaminant_src_ff_fdm.csv"))
    m = obs.coords[:, 2] > 0
    case = contaminant_transport_2d(kappa=0.03, src_sigma=0.12)
    vn = VarNet(case["pde"], layer_width=(48, 48, 48), disc_num=8,
                t_disc_num=4, n_devices=1,
                fourier_features=64, fourier_scale=0.5)
    vn.theta = theta
    u = vn.evaluate(obs.coords[m, :2], t=obs.coords[m, 2])
    err = rel_l2_error(u, obs.values[m])
    assert err < 0.06, f"source-ff vs FDM regression: rel-L2 {err:.3f}"


def test_contaminant_original_ff_hard_theta_matches_fdm():
    """Pin the ORIGINAL-parameter (kappa=0.01/sigma=0.06) source-driven
    contaminant solved NON-causally: hard BC/IC (exact imposition kills
    the u=0 attractor's BC-loss basin) + multi-scale FF-128 (0.5, 2.0)
    width-96 net, measured 2.27% overall vs the CN-FDM field
    (queue11/12 2026-08-19, contaminant_validation.json 'source-ff-hard').
    Second independent escape alongside the causal curriculum (1.63%)."""
    import os

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_transport_2d
    from varnet_tpu.utils.io import load_observations_csv

    base = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    theta_path = os.path.join(base, "results",
                              "theta_contaminant_ff_hard.npz")
    if not os.path.exists(theta_path):
        pytest.skip("no persisted source ff+hard theta yet")
    theta = load_theta_npz(theta_path)
    obs = load_observations_csv(os.path.join(base, "data",
                                             "contaminant_fdm.csv"))
    m = obs.coords[:, 2] > 0
    case = contaminant_transport_2d()  # original kappa=0.01, sigma=0.06
    vn = VarNet(case["pde"], layer_width=(96, 96, 96), disc_num=8,
                t_disc_num=4, n_devices=1, hard_bc=True,
                fourier_features=128, fourier_scale="0.5,2.0")
    vn.theta = theta
    u = vn.evaluate(obs.coords[m, :2], t=obs.coords[m, 2])
    err = rel_l2_error(u, obs.values[m])
    assert err < 0.035, f"source ff+hard vs FDM regression: rel-L2 {err:.3f}"


def test_fdm_free_outflow_runs_and_bounded():
    """The contaminant config (free right edge -> one-sided stencils) runs,
    conserves sign, and stays bounded."""
    from varnet_tpu.problems.analytic import contaminant_transport_2d

    case = contaminant_transport_2d()
    out = solve_ad_fdm_2d(case["pde"], nx=64, ny=32, nt=64,
                          sample_times=np.linspace(0.0, 1.0, 4))
    u = out["u"]
    assert np.all(np.isfinite(u))
    assert u.max() > 1e-3          # the source actually injected mass
    assert u.min() > -0.05         # no blow-up / oscillation catastrophe
    assert abs(u[0]).max() == 0.0  # zero IC snapshot


def _fdm_neumann_error(nx, nt):
    """Same analytic problem, but the RIGHT edge carries exact FLUX data
    (NeumannBC) instead of Dirichlet values."""
    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE, NeumannBC

    case = transient_ad_2d()
    p0, c_ex, c_ex_grad = case["pde"], case["c_ex"], case["c_ex_grad"]
    kappa = 0.05

    def flux_right(x, t):
        return kappa * c_ex_grad(x, t)[:, 0]  # n = +e_x

    pde = ADPDE(
        RectangleDomain2D((0, 0), (1, 1)), diff=kappa, vel=p0.vel,
        source=0.0, t_interval=p0.t_interval,
        bcs=[p0.bcs[0], NeumannBC(flux_right), p0.bcs[2], p0.bcs[3]],
        ic=p0.ic, c_ex=c_ex,
    )
    times = np.linspace(0.0, 0.5, 6)
    out = solve_ad_fdm_2d(pde, nx=nx, ny=nx, nt=nt, sample_times=times)
    pred, true = [], []
    for s, t in enumerate(out["times"]):
        pred.append(out["u"][s])
        true.append(c_ex(out["x"], np.full(out["x"].shape[0], t)))
    return rel_l2_error(np.concatenate(pred), np.concatenate(true))


def test_fdm_neumann_edge_second_order():
    """The ghost-flux NeumannBC treatment keeps the scheme second-order
    and accurate (measured: 8.1e-4 at nx=32, 2.0e-4 at nx=64 — ratio 4).
    Regression for the bug where NeumannBC edges were classified as
    Dirichlet and poisoned the solve with NaNs."""
    e_coarse = _fdm_neumann_error(nx=16, nt=32)
    e_fine = _fdm_neumann_error(nx=32, nt=64)
    assert np.isfinite(e_coarse) and np.isfinite(e_fine)
    assert e_fine < 5e-3, e_fine
    assert e_fine < e_coarse / 2.5, (e_coarse, e_fine)


def test_fdm_robin_edge_second_order():
    """RobinBC in the FDM: the -2a/h diagonal + 2g/h source keep the
    scheme second-order on the analytic transient problem."""
    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE, RobinBC

    case = transient_ad_2d()
    p0, c_ex, c_ex_grad = case["pde"], case["c_ex"], case["c_ex_grad"]
    kappa, a = 0.05, 1.0

    def g_right(x, t):
        return a * c_ex(x, t) + kappa * c_ex_grad(x, t)[:, 0]

    def err(nx, nt):
        pde = ADPDE(
            RectangleDomain2D((0, 0), (1, 1)), diff=kappa, vel=p0.vel,
            source=0.0, t_interval=p0.t_interval,
            bcs=[p0.bcs[0], RobinBC(alpha=a, flux=g_right), p0.bcs[2],
                 p0.bcs[3]],
            ic=p0.ic, c_ex=c_ex,
        )
        times = np.linspace(0.0, 0.5, 6)
        out = solve_ad_fdm_2d(pde, nx=nx, ny=nx, nt=nt, sample_times=times)
        pred, true = [], []
        for s, t in enumerate(out["times"]):
            pred.append(out["u"][s])
            true.append(c_ex(out["x"], np.full(out["x"].shape[0], t)))
        return rel_l2_error(np.concatenate(pred), np.concatenate(true))

    e_coarse, e_fine = err(16, 32), err(32, 64)
    assert np.isfinite(e_coarse) and np.isfinite(e_fine)
    assert e_fine < 5e-3, e_fine
    assert e_fine < e_coarse / 2.5, (e_coarse, e_fine)
