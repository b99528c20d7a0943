"""Finite-element master element and hat-function quadrature tables.

TPU-native re-implementation of the reference's variational machinery
(reference: ``FiniteElement.py``, class ``FE`` — SURVEY.md §2.1 #5): first
order (multi-)linear shape functions on the master element, tensor-product
Gauss-Legendre quadrature, and the compactly-supported "hat" test functions
centred at grid nodes.

Everything here is host-side NumPy: the outputs are *fixed data* — constant
tables that are uploaded to the TPU once and contracted against network
outputs at train time (SURVEY.md §0 item 4).  Because the training grid is
uniform, the test-function values N, gradients dN, and quadrature weights w
are IDENTICAL for every node: only [nQ]-sized tables are needed, not
[K, nQ] — a large memory saving over the reference layout, and exactly the
broadcast-friendly form the residual einsum wants.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np


def gauss_legendre(n: int):
    """Gauss-Legendre points/weights on [-1, 1]; exact for degree <= 2n-1."""
    pts, wts = np.polynomial.legendre.leggauss(int(n))
    return pts.astype(np.float64), wts.astype(np.float64)


class MasterElement:
    """Multilinear master element on [-1, 1]^dim with 2^dim corner nodes.

    Mirrors the reference FE class surface (SURVEY.md §1 table: "FE(dim,
    integPnum) -> GL points/weights, N, dN on master element").
    """

    def __init__(self, dim: int, integ_p_num: int = 2):
        if dim < 1:
            raise ValueError("dim must be >= 1")
        if integ_p_num < 1:
            raise ValueError("integ_p_num must be >= 1")
        self.dim = int(dim)
        self.integ_p_num = int(integ_p_num)
        # Corner nodes in {-1, +1}^dim, lexicographic order.
        self.nodes = np.array(
            list(itertools.product((-1.0, 1.0), repeat=self.dim)), dtype=np.float64
        )  # [2^dim, dim]
        # Tensor-product Gauss-Legendre rule.
        p1, w1 = gauss_legendre(self.integ_p_num)
        grids = np.meshgrid(*([p1] * self.dim), indexing="ij")
        self.gauss_points = np.stack([g.ravel() for g in grids], axis=-1)
        wgrids = np.meshgrid(*([w1] * self.dim), indexing="ij")
        self.gauss_weights = np.prod(np.stack([g.ravel() for g in wgrids], -1), -1)

    @property
    def n_nodes(self) -> int:
        return 2**self.dim

    def shape_values(self, xi: np.ndarray) -> np.ndarray:
        """N_i(xi) for all corners i.  xi: [P, dim] -> [P, 2^dim].

        N_i(xi) = prod_j (1 + node_ij * xi_j) / 2; partition of unity.
        """
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        # [P, 2^dim, dim]
        terms = (1.0 + self.nodes[None, :, :] * xi[:, None, :]) / 2.0
        return np.prod(terms, axis=-1)

    def shape_grads(self, xi: np.ndarray) -> np.ndarray:
        """dN_i/dxi_j at xi.  xi: [P, dim] -> [P, 2^dim, dim]."""
        xi = np.atleast_2d(np.asarray(xi, dtype=np.float64))
        terms = (1.0 + self.nodes[None, :, :] * xi[:, None, :]) / 2.0  # [P,2^d,d]
        grads = np.empty(terms.shape, dtype=np.float64)
        for j in range(self.dim):
            others = np.prod(np.delete(terms, j, axis=-1), axis=-1)  # [P, 2^d]
            grads[:, :, j] = (self.nodes[None, :, j] / 2.0) * others
        return grads


@dataclass(frozen=True)
class HatQuadrature:
    """Quadrature tables for a node-centred multilinear hat test function.

    The hat v_k centred at grid node x_k on a uniform grid with per-dim
    spacing h spans the 2^dim elements around x_k (its support is the box
    x_k +/- h).  Because v_k has a kink at x_k along each axis, the rule
    integrates each of the 2^dim orthants of the support with a mapped
    tensor-product Gauss-Legendre rule (SURVEY.md §0 items 2-4).

    Tables (node-independent on a uniform grid):
      offsets [nQ, dim]  quad-point coordinates relative to the node centre
      N       [nQ]       v_k at the quad points
      dN      [nQ, dim]  grad v_k at the quad points (ALL dims, incl. time)
      w       [nQ]       Gauss weight x Jacobian determinant

    nQ = (2 * integ_p_num)^dim.  Per-node quad coordinates are
    ``x_k[None, :] + offsets``.
    """

    dim: int
    h: np.ndarray  # [dim] grid spacing
    integ_p_num: int
    offsets: np.ndarray
    N: np.ndarray
    dN: np.ndarray
    w: np.ndarray

    @staticmethod
    def build(h, integ_p_num: int = 2) -> "HatQuadrature":
        h = np.atleast_1d(np.asarray(h, dtype=np.float64))
        dim = h.shape[0]
        eta, wg = gauss_legendre(integ_p_num)
        # Per-dim combined table over both orthants (2 * n entries per dim).
        # In orthant sign s along dim j, a quad point sits at
        #   x = x_k + s * h_j * (1 + eta) / 2,           eta in [-1, 1]
        # where the 1-D hat factor and its derivative are
        #   hat = (1 - eta) / 2,   dhat/dx = -s / h_j,
        # and the 1-D Jacobian weight is w = wg * h_j / 2.
        off_1d, hat_1d, dhat_1d, w_1d = [], [], [], []
        for j in range(dim):
            offs, hats, dhats, ws = [], [], [], []
            for s in (-1.0, 1.0):
                offs.append(s * h[j] * (1.0 + eta) / 2.0)
                hats.append((1.0 - eta) / 2.0)
                dhats.append(np.full_like(eta, -s / h[j]))
                ws.append(wg * h[j] / 2.0)
            off_1d.append(np.concatenate(offs))
            hat_1d.append(np.concatenate(hats))
            dhat_1d.append(np.concatenate(dhats))
            w_1d.append(np.concatenate(ws))

        # Tensor product across dims.
        n1 = 2 * integ_p_num
        idx = np.meshgrid(*([np.arange(n1)] * dim), indexing="ij")
        idx = np.stack([i.ravel() for i in idx], axis=-1)  # [nQ, dim]
        nq = idx.shape[0]
        offsets = np.empty((nq, dim))
        hat_f = np.empty((nq, dim))
        dhat_f = np.empty((nq, dim))
        w_f = np.empty((nq, dim))
        for j in range(dim):
            offsets[:, j] = off_1d[j][idx[:, j]]
            hat_f[:, j] = hat_1d[j][idx[:, j]]
            dhat_f[:, j] = dhat_1d[j][idx[:, j]]
            w_f[:, j] = w_1d[j][idx[:, j]]
        N = np.prod(hat_f, axis=-1)
        w = np.prod(w_f, axis=-1)
        dN = np.empty((nq, dim))
        for j in range(dim):
            others = np.prod(np.delete(hat_f, j, axis=-1), axis=-1)
            dN[:, j] = dhat_f[:, j] * others
        return HatQuadrature(
            dim=dim, h=h, integ_p_num=int(integ_p_num),
            offsets=offsets, N=N, dN=dN, w=w,
        )

    @property
    def n_quad(self) -> int:
        return self.offsets.shape[0]

    def support_volume(self) -> float:
        """Volume of supp(v_k) = prod_j 2 h_j; integral of weights equals it."""
        return float(np.prod(2.0 * self.h))
