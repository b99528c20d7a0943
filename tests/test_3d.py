"""3-D spatial support (beyond-reference — the reference geometry layer
stops at 2-D, SURVEY.md §2.1 #4): BoxDomainND geometry, the keystone
residual-of-exact-solution check (SURVEY.md §4) on the 3-D manufactured
case, and a small end-to-end train.  Every layer above geometry is
dimension-generic, so these tests exercise the SAME assembly/loss/trainer
code paths as 1-D/2-D."""

import pytest

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import BoxDomain3D, BoxDomainND
from varnet_tpu.problems.analytic import steady_ad_3d, transient_ad_3d

from tests.test_assembly import residual_of_function


def test_box3d_mesh_and_interior():
    dom = BoxDomain3D((0.0, 0.0, 0.0), (1.0, 2.0, 1.0))
    m = dom.mesh((4, 8, 4))
    assert m.nodes.shape == (5 * 9 * 5, 3)
    np.testing.assert_allclose(m.spacing, [0.25, 0.25, 0.25])
    # interior = nodes one spacing from every face
    assert m.interior_nodes.shape == (3 * 7 * 3, 3)
    assert dom.n_boundary_segments == 6


def test_box3d_boundary_points_disjoint_and_on_faces():
    """Cell-centred face grids: every point lies strictly inside its face
    (no face edges), so no point appears on two faces."""
    dom = BoxDomain3D()
    segs = dom.boundary_points(4)
    assert len(segs) == 6
    allpts = np.concatenate(segs, axis=0)
    assert allpts.shape == (6 * 16, 3)
    # pairwise distinct
    assert len({tuple(np.round(p, 12)) for p in allpts}) == allpts.shape[0]
    # face 0 = x_lo, face 1 = x_hi, ... ; transverse coords strictly inside
    for j in range(3):
        for s, side in enumerate((0.0, 1.0)):
            f = segs[2 * j + s]
            np.testing.assert_allclose(f[:, j], side)
            others = np.delete(f, j, axis=1)
            assert np.all((others > 0) & (others < 1))


def test_boxnd_support_inside_per_dim_half():
    dom = BoxDomainND((0.0, 0.0), (1.0, 1.0))
    c = np.array([[0.25, 0.5], [0.1, 0.5]])
    ok = dom.support_inside(c, (0.25, 0.25))
    np.testing.assert_array_equal(ok, [True, False])


def test_analytic_solution_residual_converges_3d():
    """Keystone (SURVEY.md §4): the weak residual of the exact 3-D
    solution vanishes at the quadrature convergence rate under
    refinement — through the SAME dimension-generic assembly as 1-D/2-D."""
    case = steady_ad_3d()
    maxr = []
    for disc in (6, 12):
        fixed = build_fixed_data(case["pde"], disc_num=disc, b_disc_num=4)
        r = residual_of_function(fixed, case["c_ex_grad"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


def test_analytic_solution_residual_converges_3d_transient():
    """Same keystone through the 4-D tensor-product tables
    (nQ = (2q)^4 = 256): space-time hats around each interior
    (node, time-level) centre."""
    case = transient_ad_3d()
    maxr = []
    for disc, tdisc in ((4, 4), (8, 8)):
        fixed = build_fixed_data(case["pde"], disc_num=disc,
                                 t_disc_num=tdisc, b_disc_num=3)
        r = residual_of_function(fixed, case["c_ex_grad"], case["c_ex_dt"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


def test_3d_bc_values_zero_on_all_faces():
    case = steady_ad_3d()
    fixed = build_fixed_data(case["pde"], disc_num=6, b_disc_num=3)
    # manufactured sin*sin*sin vanishes on every face
    np.testing.assert_allclose(fixed.bc.values, 0.0)
    assert fixed.static.n_bc == 6 * 9


@pytest.mark.slow
def test_3d_sharded_matches_single_device():
    """3-D data sharding over the 8-device mesh reproduces the 1-device
    loss history (short run: the 1-core test box hits XLA CPU rendezvous
    timeouts when hundreds of 8-thread collectives queue up — CLAUDE.md;
    long-budget accuracy runs therefore stay on 1 device below)."""
    case = steady_ad_3d()

    def run(nd):
        vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=6,
                    b_disc_num=4, n_devices=nd, seed=3)
        r = vn.train(epoch_num=30, weight=(1.0, 10.0), save_freq=1,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    l8, l1 = run(8), run(1)
    # First step: identical up to f32 reduction order (a sharding bug that
    # changes VALUES — e.g. a missing psum — is off by ~n_devices here).
    np.testing.assert_allclose(l8[0], l1[0], rtol=1e-5)
    # Trajectory: Adam amplifies the per-step 1e-7 reduction-order noise
    # (measured: 1.4e-4 after one update, ~4e-3 after 30) — keep a band
    # that still catches any structural divergence.
    np.testing.assert_allclose(l8, l1, rtol=3e-2)


@pytest.mark.slow
def test_3d_end_to_end_train():
    """The 3-D manufactured solution trains to a clearly-converged rel-L2
    through Adam + LM (measured at this budget: ~3.4e-2 in ~70 s on one
    CPU core; 2000 epochs + 20 LM reach 1.05e-2)."""
    case = steady_ad_3d()
    vn = VarNet(case["pde"], layer_width=(24, 24), disc_num=8,
                b_disc_num=6, n_devices=1)
    vn.train(epoch_num=800, weight=(1.0, 10.0), save_freq=800,
             verbose=False, error_disc=12)
    r = vn.refine_lm(steps=12, weight=(1.0, 10.0), cg_iters=40,
                     save_freq=12, verbose=False, matmul_precision=None,
                     error_disc=12)
    assert r.best_error() < 5e-2, r.best_error()


def test_plot_fields_3d_slices(tmp_path):
    import os

    from varnet_tpu.viz.plot import plot_fields

    case = steady_ad_3d()
    files = plot_fields(case["pde"], str(tmp_path), disc=8)
    names = {os.path.basename(f) for f in files}
    assert "field_kappa_x2_0.50.png" in names
    assert "field_vel_z_x2_0.50.png" in names
