"""PrismDomain3D — extruded-polygon (non-convex) 3-D geometry.

Beyond-reference on two axes at once (SURVEY.md §2.1 #4: the reference
stops at 2-D polygons): the L-shaped-duct case exercises non-convex
point-in-domain, support trimming at the re-entrant vertical edge, the
wall/cap boundary bookkeeping, and the same keystone residual-of-analytic
test every other domain passes (SURVEY.md §4).
"""

import pytest

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import BoxDomain3D, PrismDomain3D
from varnet_tpu.problems.analytic import steady_ad_prism

from tests.test_assembly import residual_of_function

LSHAPE = np.array([
    [0.0, 0.0], [1.0, 0.0], [1.0, 0.5], [0.5, 0.5],
    [0.5, 1.0], [0.0, 1.0],
])


def test_prism_mesh_interior_trims_reentrant_edge():
    dom = PrismDomain3D(LSHAPE, 0.0, 1.0)
    mesh = dom.mesh((8, 8, 4))  # h = (0.125, 0.125, 0.25)
    inner = mesh.interior_nodes
    assert inner.shape[0] > 0
    # every interior centre's full support patch is inside the prism
    assert dom.support_inside(inner, mesh.spacing).all()
    # a node ON the re-entrant vertical edge (support pokes into the
    # cut-out quadrant) is NOT an interior node
    bad = np.array([[0.5, 0.5, 0.5]])
    assert not dom.support_inside(bad, mesh.spacing)[0]
    # nodes in the two legs, one spacing from every wall, ARE interior
    good = np.array([[0.25, 0.25, 0.5], [0.75, 0.25, 0.5],
                     [0.25, 0.75, 0.5]])
    assert dom.support_inside(good, mesh.spacing).all()


def test_square_prism_matches_box():
    """A unit-square prism is a unit box: identical interior node sets and
    matching cap normals (walls are ordered differently by construction)."""
    sq = PrismDomain3D(np.array([[0.0, 0.0], [1.0, 0.0],
                                 [1.0, 1.0], [0.0, 1.0]]), 0.0, 1.0)
    box = BoxDomain3D()
    mp, mb = sq.mesh(6), box.mesh(6)
    p = mp.interior_nodes
    b = mb.interior_nodes
    assert p.shape == b.shape
    order = np.lexsort(p.T), np.lexsort(b.T)
    np.testing.assert_allclose(p[order[0]], b[order[1]])
    np.testing.assert_allclose(sq.segment_normal(4), [0, 0, -1])
    np.testing.assert_allclose(sq.segment_normal(5), [0, 0, 1])


def test_prism_boundary_points_disjoint_and_on_boundary():
    dom = PrismDomain3D(LSHAPE, 0.0, 1.0)
    segs = dom.boundary_points(5)
    assert len(segs) == dom.n_boundary_segments == 8
    allpts = np.concatenate(segs, axis=0)
    # no point is shared across segments (in_domain is NOT asserted here:
    # wall points lie exactly on polygon edges, where ray casting is
    # documentedly ambiguous — the per-segment geometry below pins them)
    uniq = np.unique(np.round(allpts, 12), axis=0)
    assert uniq.shape[0] == allpts.shape[0]
    # walls: xy on the owning polygon edge, z strictly inside the slab
    for i in range(6):
        w = segs[i]
        a, b = LSHAPE[i], LSHAPE[(i + 1) % 6]
        d = b - a
        cross = (w[:, 0] - a[0]) * d[1] - (w[:, 1] - a[1]) * d[0]
        np.testing.assert_allclose(cross, 0.0, atol=1e-12)
        assert ((w[:, 2] > 0.0) & (w[:, 2] < 1.0)).all()
        n = dom.segment_normal(i)
        assert abs(np.linalg.norm(n) - 1.0) < 1e-12 and n[2] == 0.0
    # caps: xy strictly inside the polygon footprint, z pinned
    for j, z in ((6, 0.0), (7, 1.0)):
        c = segs[j]
        np.testing.assert_allclose(c[:, 2], z)
        assert dom.poly.in_domain(c[:, :2]).all()


def test_analytic_solution_residual_converges_prism():
    """Keystone (SURVEY.md §4): the weak residual of the exact solution
    vanishes under refinement through the SAME dimension-generic assembly
    — now with non-convex support trimming in 3-D."""
    case = steady_ad_prism()
    maxr = []
    for disc in ((8, 8, 4), (16, 16, 8)):
        fixed = build_fixed_data(case["pde"], disc_num=disc, b_disc_num=4)
        r = residual_of_function(fixed, case["c_ex_grad"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


@pytest.mark.slow
def test_prism_end_to_end_train():
    """Short Adam + LM on the L-duct manufactured case converges well
    below the untrained scale (relL2 ~1 at init).  The case is
    boundary-driven via the re-entrant walls — an all-zero-data variant
    measurably hit the zero-data attractor (see steady_ad_prism docs)."""
    case = steady_ad_prism()
    vn = VarNet(case["pde"], layer_width=(24, 24), disc_num=(8, 8, 6),
                b_disc_num=6, n_devices=1, seed=0)
    res = vn.train(epoch_num=800, weight=(1.0, 10.0), save_freq=800,
                   verbose=False, error_disc=12)
    r = vn.refine_lm(steps=10, weight=(1.0, 10.0), cg_iters=40,
                     save_freq=10, verbose=False, matmul_precision=None,
                     error_disc=12)
    assert min(res.errors + r.errors) < 1e-1, (res.errors, r.errors)


@pytest.mark.slow
def test_prism_hard_bc_exactness_and_train():
    """Hard BC on the L-duct: a random network reproduces the Dirichlet
    data exactly on every wall and cap (wall ADFs are the polygon's
    trimmed segment ADFs on the xy footprint, caps are plane distances),
    D > 0 inside, and short Adam + LM training runs with the BC rows
    reported exactly 0."""
    case = steady_ad_prism()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=(6, 6, 4),
                b_disc_num=4, n_devices=1, hard_bc=True, seed=2)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.7
    dom = case["pde"].domain
    for seg, pts in enumerate(dom.boundary_points(5)):
        u = vn.evaluate(pts)
        np.testing.assert_allclose(u, case["c_ex"](pts), atol=5e-6,
                                   err_msg=f"segment {seg}")
    # ADF positive at interior probes, including points on the re-entrant
    # walls' plane EXTENSIONS (x = 0.5 below y = 0.5 etc.)
    probes = np.array([[0.25, 0.25, 0.5], [0.5, 0.25, 0.5],
                       [0.25, 0.5, 0.5], [0.75, 0.25, 0.3]])
    assert (vn.hard.dist(probes) > 1e-4).all()
    res = vn.train(epoch_num=150, save_freq=150, verbose=False,
                   error_disc=8)
    assert res.losses[-1]["loss_bc"] == 0.0
    r = vn.refine_lm(steps=2, cg_iters=20, save_freq=2, verbose=False,
                     error_disc=8)
    assert min(res.errors + r.errors) < res.errors[0]


def test_prism_transient_composes():
    """Transient problems on a prism ride the same space-time tensor
    tables (4-D with a polygon footprint): the keystone residual test on
    a manufactured transient solution."""
    import numpy as np
    from varnet_tpu.problems.adpde import ADPDE

    dom = PrismDomain3D(LSHAPE, 0.0, 1.0)

    def c_ex(x, t):
        x = np.atleast_2d(x)
        return (np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
                * np.sin(np.pi * x[:, 2]) * np.exp(-np.asarray(t)))

    def c_ex_grad(x, t):
        x = np.atleast_2d(x)
        s, c = np.sin(np.pi * x), np.cos(np.pi * x)
        e = np.exp(-np.asarray(t))
        return np.pi * e[..., None] * np.stack(
            [c[:, 0] * s[:, 1] * s[:, 2],
             s[:, 0] * c[:, 1] * s[:, 2],
             s[:, 0] * s[:, 1] * c[:, 2]], axis=-1)

    kappa, v = 0.05, np.array([1.0, 0.5, 0.25])

    def source(x, t):
        g = c_ex_grad(x, t)
        return (-c_ex(x, t) + g @ v
                + kappa * 3.0 * np.pi**2 * c_ex(x, t))

    pde = ADPDE(dom, diff=kappa, vel=v, source=source,
                bcs=[lambda x, t: c_ex(x, t)] * 8,
                t_interval=(0.0, 0.5),
                ic=lambda x: c_ex(x, np.zeros(np.atleast_2d(x).shape[0])),
                c_ex=c_ex)
    maxr = []
    for disc, tdisc in (((6, 6, 4), 4), ((12, 12, 8), 8)):
        fixed = build_fixed_data(pde, disc_num=disc, t_disc_num=tdisc,
                                 b_disc_num=3)
        r = residual_of_function(fixed, c_ex_grad,
                                 lambda x, t: -c_ex(x, t))
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


def test_prism_slice_plots(tmp_path):
    """viz composes: 3-D slice plots mask to the polygon footprint."""
    import os

    from varnet_tpu.viz.plot import plot_fields

    case = steady_ad_prism()
    files = plot_fields(case["pde"], str(tmp_path), disc=8)
    names = {os.path.basename(f) for f in files}
    assert "field_kappa_x2_0.50.png" in names
