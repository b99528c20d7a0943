"""Unit tests for the FEM layer (SURVEY.md §4 'do better, cheaply'):
Gauss-Legendre exactness, shape-function partition of unity, hat-function
quadrature identities."""

import numpy as np
import pytest

from varnet_tpu.fem.element import HatQuadrature, MasterElement, gauss_legendre


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_gauss_legendre_polynomial_exactness(n):
    pts, wts = gauss_legendre(n)
    for k in range(2 * n):  # exact through degree 2n-1
        num = np.sum(wts * pts**k)
        exact = 0.0 if k % 2 == 1 else 2.0 / (k + 1)
        assert abs(num - exact) < 1e-13, (n, k)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_shape_functions_partition_of_unity(dim):
    el = MasterElement(dim, integ_p_num=2)
    rng = np.random.default_rng(0)
    xi = rng.uniform(-1, 1, size=(50, dim))
    vals = el.shape_values(xi)
    assert vals.shape == (50, 2**dim)
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-13)
    grads = el.shape_grads(xi)
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-13)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_shape_functions_kronecker_at_nodes(dim):
    el = MasterElement(dim)
    vals = el.shape_values(el.nodes)
    np.testing.assert_allclose(vals, np.eye(2**dim), atol=1e-14)


def test_shape_grads_match_finite_differences():
    el = MasterElement(2)
    xi = np.array([[0.3, -0.4]])
    g = el.shape_grads(xi)[0]
    eps = 1e-6
    for j in range(2):
        dxi = np.zeros((1, 2))
        dxi[0, j] = eps
        fd = (el.shape_values(xi + dxi) - el.shape_values(xi - dxi))[0] / (2 * eps)
        np.testing.assert_allclose(g[:, j], fd, atol=1e-8)


@pytest.mark.parametrize("dim,n", [(1, 2), (2, 2), (3, 2), (2, 3)])
def test_hat_quadrature_weight_sum_is_support_volume(dim, n):
    h = 0.1 + 0.05 * np.arange(1, dim + 1)
    hq = HatQuadrature.build(h, integ_p_num=n)
    assert hq.n_quad == (2 * n) ** dim
    np.testing.assert_allclose(hq.w.sum(), np.prod(2 * h), rtol=1e-13)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_hat_integral(dim):
    """integral of v_k over its support = prod_j h_j (1-D hat integrates to h)."""
    h = np.full(dim, 0.2)
    hq = HatQuadrature.build(h, integ_p_num=2)
    np.testing.assert_allclose(np.sum(hq.w * hq.N), np.prod(h), rtol=1e-13)


@pytest.mark.parametrize("dim", [1, 2])
def test_hat_gradient_integral_is_zero(dim):
    """integral of grad(v_k) vanishes by odd symmetry of the hat."""
    hq = HatQuadrature.build(np.full(dim, 0.3), integ_p_num=2)
    np.testing.assert_allclose(hq.w @ hq.dN, 0.0, atol=1e-13)


def test_hat_quadrature_1d_moment_values():
    """Analytic moments of the 1-D hat:
    int v x dx = 0,  int v x^2 dx = h^3 / 6 (about the centre)."""
    h = 0.25
    hq = HatQuadrature.build([h], integ_p_num=2)
    x = hq.offsets[:, 0]
    np.testing.assert_allclose(np.sum(hq.w * hq.N * x), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.sum(hq.w * hq.N * x * x), h**3 / 6, rtol=1e-12)


def test_hat_values_match_closed_form():
    """v_k(x) = prod_j max(0, 1 - |x_j - x_kj| / h_j) at the quad points."""
    h = np.array([0.2, 0.4])
    hq = HatQuadrature.build(h, integ_p_num=3)
    expected = np.prod(np.maximum(0.0, 1.0 - np.abs(hq.offsets) / h), axis=1)
    np.testing.assert_allclose(hq.N, expected, rtol=1e-12)


def test_hat_gradient_matches_closed_form():
    h = np.array([0.2, 0.4])
    hq = HatQuadrature.build(h, integ_p_num=2)
    hats = np.maximum(0.0, 1.0 - np.abs(hq.offsets) / h)
    for j in range(2):
        other = hats[:, 1 - j]
        expected = -np.sign(hq.offsets[:, j]) / h[j] * other
        np.testing.assert_allclose(hq.dN[:, j], expected, rtol=1e-12)
