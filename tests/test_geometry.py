"""Geometry layer tests: meshes, point-in-polygon, boundary discretization."""

import numpy as np
import pytest

from varnet_tpu.geometry.domain import Domain1D, PolygonDomain2D, RectangleDomain2D
from varnet_tpu.utils.helpers import pair_mats, rel_l2_error


def test_domain1d_mesh():
    dom = Domain1D(0.0, 2.0)
    mesh = dom.mesh(10)
    assert mesh.nodes.shape == (11, 1)
    np.testing.assert_allclose(mesh.spacing, [0.2])
    assert mesh.interior_nodes.shape == (9, 1)
    assert np.all(dom.in_domain(mesh.interior_nodes))


def test_domain1d_boundary():
    dom = Domain1D(-1.0, 3.0)
    segs = dom.boundary_points()
    assert len(segs) == 2
    np.testing.assert_allclose(segs[0], [[-1.0]])
    np.testing.assert_allclose(segs[1], [[3.0]])


def test_rectangle_mesh_interior_count():
    dom = RectangleDomain2D((0, 0), (1, 2))
    mesh = dom.mesh((10, 20))
    assert mesh.nodes.shape == (11 * 21, 2)
    np.testing.assert_allclose(mesh.spacing, [0.1, 0.1])
    # hats may touch the boundary: interior = strictly-inside grid nodes
    assert mesh.interior_nodes.shape[0] == 9 * 19


def test_rectangle_in_domain():
    dom = RectangleDomain2D((0, 0), (1, 1))
    pts = np.array([[0.5, 0.5], [1.5, 0.5], [-0.1, 0.2], [0.99, 0.01]])
    np.testing.assert_array_equal(dom.in_domain(pts), [True, False, False, True])


def test_polygon_nonconvex_in_domain():
    # L-shape: unit square minus its upper-right quadrant
    verts = np.array([[0, 0], [1, 0], [1, 0.5], [0.5, 0.5], [0.5, 1], [0, 1]])
    dom = PolygonDomain2D(verts)
    pts = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75], [1.2, 0.2]]
    )
    np.testing.assert_array_equal(
        dom.in_domain(pts), [True, True, True, False, False]
    )


def test_polygon_mesh_interior_inside_domain():
    verts = np.array([[0, 0], [1, 0], [1, 0.5], [0.5, 0.5], [0.5, 1], [0, 1]])
    dom = PolygonDomain2D(verts)
    mesh = dom.mesh(8)
    interior = mesh.interior_nodes
    assert interior.shape[0] > 0
    assert np.all(dom.in_domain(interior))
    # no interior node in the removed quadrant
    assert not np.any((interior[:, 0] > 0.5) & (interior[:, 1] > 0.5))


def test_polygon_rectangle_agree():
    """The generic polygon path and the rectangle fast path select the same
    interior test-function centres."""
    rect = RectangleDomain2D((0, 0), (1, 1))
    poly = PolygonDomain2D(rect.vertices)
    mr = rect.mesh(12)
    mp = poly.mesh(12)
    np.testing.assert_array_equal(mr.interior_mask, mp.interior_mask)


def test_boundary_points_on_edges():
    dom = RectangleDomain2D((0, 0), (2, 1))
    segs = dom.boundary_points(4)
    assert len(segs) == 4
    for s in segs:
        assert s.shape == (4, 2)  # half-open: start vertex in, end vertex out
    np.testing.assert_allclose(segs[0][:, 1], 0.0)  # bottom edge: y = 0
    np.testing.assert_allclose(segs[2][:, 1], 1.0)  # top edge: y = 1
    # Each corner appears exactly once across all segments.
    allpts = np.concatenate(segs)
    for v in dom.vertices:
        hits = np.sum(np.all(np.isclose(allpts, v[None, :]), axis=1))
        assert hits == 1


def test_pair_mats():
    a = np.array([[1.0], [2.0], [3.0]])
    b = np.array([[10.0], [20.0]])
    p = pair_mats(a, b)
    assert p.shape == (6, 2)
    np.testing.assert_allclose(p[0], [1, 10])
    np.testing.assert_allclose(p[2], [3, 10])
    np.testing.assert_allclose(p[3], [1, 20])


def test_rel_l2_error():
    assert rel_l2_error([1, 1], [1, 1]) == 0.0
    assert abs(rel_l2_error([2, 0], [1, 0]) - 1.0) < 1e-12
