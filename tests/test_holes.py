"""PolygonDomain2D with HOLES — internal obstacle boundaries.

Beyond-reference (SURVEY.md §2.1 #4 covers simple polygons only): the
square-with-a-square-hole case exercises hole-aware point-in-domain,
support trimming around the obstacle, hole-edge boundary bookkeeping and
normals, the keystone residual-of-analytic test, hard-BC exactness on the
obstacle wall, and the prism (extruded duct-with-a-rod) composition.
"""

import pytest

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.geometry.domain import PolygonDomain2D, PrismDomain3D
from varnet_tpu.problems.analytic import obstacle_manufactured_2d

from tests.test_assembly import residual_of_function

OUTER = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
HOLE = np.array([[0.375, 0.375], [0.625, 0.375],
                 [0.625, 0.625], [0.375, 0.625]])


def test_in_domain_excludes_hole():
    dom = PolygonDomain2D(OUTER, holes=[HOLE])
    pts = np.array([[0.5, 0.5], [0.2, 0.2], [0.5, 0.2], [0.4, 0.4],
                    [1.2, 0.5]])
    np.testing.assert_array_equal(
        dom.in_domain(pts), [False, True, True, False, False])


def test_hole_vertices_must_be_inside():
    import pytest

    with pytest.raises(ValueError, match="inside"):
        PolygonDomain2D(OUTER, holes=[HOLE + 1.0])


def test_mesh_interior_trims_around_hole():
    dom = PolygonDomain2D(OUTER, holes=[HOLE])
    mesh = dom.mesh(16)  # h = 1/16
    inner = mesh.interior_nodes
    assert inner.shape[0] > 0
    assert dom.support_inside(inner, mesh.spacing).all()
    # nodes inside or hugging the hole are excluded; far nodes kept
    assert not dom.support_inside(np.array([[0.5, 0.5]]), mesh.spacing)[0]
    assert not dom.support_inside(np.array([[0.375, 0.5]]), mesh.spacing)[0]
    assert dom.support_inside(np.array([[0.1875, 0.5]]), mesh.spacing)[0]


def test_hole_boundary_points_and_normals():
    dom = PolygonDomain2D(OUTER, holes=[HOLE])
    segs = dom.boundary_points(6)
    assert len(segs) == dom.n_boundary_segments == 8
    eps = dom.segment_endpoints()
    assert eps.shape == (8, 2, 2)
    centre = np.array([0.5, 0.5])
    for i in range(4, 8):
        # hole-edge points lie on the hole edge
        a, b = eps[i]
        d = b - a
        w = segs[i]
        cross = (w[:, 0] - a[0]) * d[1] - (w[:, 1] - a[1]) * d[0]
        np.testing.assert_allclose(cross, 0.0, atol=1e-12)
        # domain-outward normal on a hole edge points INTO the hole
        n = dom.segment_normal(i)
        mid = 0.5 * (a + b)
        assert np.dot(n, centre - mid) > 0, (i, n)
    # outer normals still point away from the domain
    assert np.dot(dom.segment_normal(0), [0.0, -1.0]) > 0.99


def test_analytic_solution_residual_converges_with_hole():
    """Keystone (SURVEY.md §4) on the obstacle geometry."""
    case = obstacle_manufactured_2d()
    maxr = []
    for disc in (16, 32):
        fixed = build_fixed_data(case["pde"], disc_num=disc, b_disc_num=6)
        r = residual_of_function(fixed, case["c_ex_grad"])
        maxr.append(np.max(np.abs(r)) / np.sum(fixed.quad.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


@pytest.mark.slow
def test_obstacle_end_to_end_train():
    case = obstacle_manufactured_2d()
    vn = VarNet(case["pde"], layer_width=(20, 20), disc_num=16,
                b_disc_num=8, n_devices=1, seed=0)
    res = vn.train(epoch_num=800, weight=(1.0, 10.0), save_freq=800,
                   verbose=False, error_disc=32)
    r = vn.refine_lm(steps=8, weight=(1.0, 10.0), cg_iters=40,
                     save_freq=8, verbose=False, matmul_precision=None,
                     error_disc=32)
    assert min(res.errors + r.errors) < 1e-1, (res.errors, r.errors)


def test_obstacle_hard_bc_exactness():
    """Hard BC with an obstacle: a random network reproduces the data
    exactly on the outer AND hole edges (hole edges ride the same trimmed
    segment ADFs), D > 0 at interior probes near the hole, and training
    reports the BC rows exactly 0."""
    case = obstacle_manufactured_2d()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=12,
                b_disc_num=6, n_devices=1, hard_bc=True, seed=1)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.6
    dom = case["pde"].domain
    for seg, pts in enumerate(dom.boundary_points(6)):
        np.testing.assert_allclose(vn.evaluate(pts), case["c_ex"](pts),
                                   atol=5e-6, err_msg=f"segment {seg}")
    probes = np.array([[0.2, 0.2], [0.3, 0.5], [0.5, 0.3], [0.7, 0.7]])
    assert (vn.hard.dist(probes) > 1e-4).all()
    res = vn.train(epoch_num=100, save_freq=100, verbose=False,
                   error_disc=16)
    assert res.losses[-1]["loss_bc"] == 0.0


def test_prism_with_hole_composes():
    """Duct with a square rod drilled out: the extruded hole walls carry
    boundary points, the mesh trims around the rod, and hard-BC exactness
    holds on the rod wall."""
    dom = PrismDomain3D(OUTER, 0.0, 1.0, holes=[HOLE])
    assert dom.n_boundary_segments == 10
    mesh = dom.mesh((8, 8, 4))
    assert not dom.support_inside(np.array([[0.5, 0.5, 0.5]]),
                                  mesh.spacing)[0]
    assert dom.support_inside(np.array([[0.125, 0.5, 0.5]]),
                              mesh.spacing)[0]
    segs = dom.boundary_points(4)
    assert len(segs) == 10
    # rod-wall points: xy on the hole edge, z inside the slab
    rod = segs[4]
    np.testing.assert_allclose(rod[:, 1], 0.375)
    assert ((rod[:, 2] > 0) & (rod[:, 2] < 1)).all()
    # hard BC: zero Dirichlet everywhere is exact for a random net
    from varnet_tpu.problems.adpde import ADPDE

    pde = ADPDE(dom, diff=0.1, vel=np.zeros(3), source=1.0, bcs=0.0)
    vn = VarNet(pde, layer_width=(10,), disc_num=(8, 8, 4), b_disc_num=4,
                n_devices=1, hard_bc=True, seed=0)
    vn.theta = [dict(l) for l in vn.theta]
    vn.theta[-1]["b"] = vn.theta[-1]["b"] + 0.5
    for pts in dom.boundary_points(4):
        np.testing.assert_allclose(vn.evaluate(pts), 0.0, atol=5e-6)


def test_fdm_with_hole_converges_to_analytic():
    """Validate the validator (SURVEY.md §4 item 2 pattern): the CN-FDM
    solver with a grid-aligned rectangular hole converges at second order
    to a manufactured transient solution whose hole-edge Dirichlet data
    is time-dependent."""
    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE
    from varnet_tpu.problems.classical import solve_ad_fdm_2d

    kappa, v = 0.1, np.array([0.6, 0.3])

    def c_ex(x, t):
        x = np.atleast_2d(x)
        return (np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
                * np.exp(-np.asarray(t)))

    def grad(x, t):
        x = np.atleast_2d(x)
        sx, cx = np.sin(np.pi * x[:, 0]), np.cos(np.pi * x[:, 0])
        sy, cy = np.sin(np.pi * x[:, 1]), np.cos(np.pi * x[:, 1])
        e = np.exp(-np.asarray(t))
        return np.pi * e[..., None] * np.stack([cx * sy, sx * cy], axis=-1)

    def source(x, t):
        g = grad(x, t)
        return (-c_ex(x, t) + g @ v + 2.0 * np.pi**2 * kappa * c_ex(x, t))

    dom = RectangleDomain2D((0.0, 0.0), (1.0, 1.0), holes=[HOLE])
    pde = ADPDE(dom, diff=kappa, vel=v, source=source,
                bcs=[0.0] * 4 + [lambda x, t: c_ex(x, t)] * 4,
                t_interval=(0.0, 0.5),
                ic=lambda x: c_ex(x, np.zeros(np.atleast_2d(x).shape[0])))
    errs = []
    for nx in (16, 32):
        out = solve_ad_fdm_2d(pde, nx=nx, ny=nx, nt=4 * nx,
                              sample_times=[0.5])
        mask = dom.in_domain(out["x"])
        u, ue = out["u"][0][mask], c_ex(out["x"][mask], 0.5)
        errs.append(np.linalg.norm(u - ue) / np.linalg.norm(ue))
    assert errs[1] < errs[0] / 3.0, errs  # second order => ~/4
    assert errs[1] < 5e-3, errs


def test_hole_edges_must_stay_inside_nonconvex_outer():
    """Vertex containment alone is not enough: a hole whose vertices sit
    in the two legs of an L-shape but whose edges cross the cut-out
    quadrant must be rejected (review finding, round 3)."""
    import pytest

    lshape = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0],
                       [1.0, 2.0], [0.0, 2.0]])
    crossing = np.array([[1.6, 0.5], [1.7, 0.6], [0.6, 1.7], [0.5, 1.6]])
    with pytest.raises(ValueError, match="strictly inside"):
        PolygonDomain2D(lshape, holes=[crossing])


def test_holes_must_be_disjoint():
    import pytest

    with pytest.raises(ValueError, match="disjoint"):
        PolygonDomain2D(OUTER, holes=[HOLE, HOLE + 0.05])
    # nested holes are also rejected (inner vertices inside the outer hole)
    with pytest.raises(ValueError, match="disjoint"):
        PolygonDomain2D(
            OUTER, holes=[HOLE, 0.5 + 0.3 * (HOLE - 0.5)])
    # well-separated holes still construct
    dom = PolygonDomain2D(
        OUTER, holes=[HOLE * 0.4 + 0.1, HOLE * 0.4 + np.array([0.5, 0.1])])
    assert len(dom.holes) == 2


def test_fdm_rejects_non_dirichlet_hole_edges():
    """eval_bc -> None on a hole edge would NaN-flood the CN solve; the
    solver must fail fast instead (review finding, round 3)."""
    import pytest

    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE, NeumannBC
    from varnet_tpu.problems.classical import solve_ad_fdm_2d

    dom = RectangleDomain2D((0.0, 0.0), (1.0, 1.0), holes=[HOLE])
    pde = ADPDE(dom, diff=0.1, vel=np.array([0.5, 0.0]), source=0.0,
                bcs=[1.0, None, 0.0, 0.0] + [NeumannBC(0.0)] * 4,
                t_interval=(0.0, 0.5), ic=0.0)
    with pytest.raises(ValueError, match="Dirichlet"):
        solve_ad_fdm_2d(pde, nx=16, ny=16, nt=16, sample_times=[0.5])


def test_fdm_rejects_unresolved_hole():
    """A hole with no grid node inside would silently solve the hole-free
    problem and mis-score every caller (review finding, round 3)."""
    import pytest

    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE
    from varnet_tpu.problems.classical import solve_ad_fdm_2d

    tiny = np.array([[0.51, 0.51], [0.55, 0.51], [0.55, 0.55], [0.51, 0.55]])
    dom = RectangleDomain2D((0.0, 0.0), (1.0, 1.0), holes=[tiny])
    pde = ADPDE(dom, diff=0.1, vel=np.array([0.5, 0.0]), source=0.0,
                bcs=[0.0] * 4 + [1.0] * 4,
                t_interval=(0.0, 0.5), ic=0.0)
    with pytest.raises(ValueError, match="no grid node"):
        solve_ad_fdm_2d(pde, nx=10, ny=10, nt=10, sample_times=[0.5])


def test_plot_domain_prism_draws_hole_ring(tmp_path):
    """plot_domain on a prism draws the FOOTPRINT including hole rings
    (the holes live on .poly; review finding, round 3)."""
    from varnet_tpu.viz.plot import plot_domain

    dom = PrismDomain3D(OUTER, z_lo=0.0, z_hi=0.5, holes=[HOLE])
    fig = plot_domain(dom, disc=12)
    try:
        rings = [ln for ln in fig.axes[0].lines
                 if ln.get_linestyle() == "-" and ln.get_color() == "k"]
        assert len(rings) == 2  # outer ring + hole ring
        assert "caps: segs 8, 9" in fig.axes[0].get_title()
    finally:
        import matplotlib.pyplot as plt

        plt.close(fig)
