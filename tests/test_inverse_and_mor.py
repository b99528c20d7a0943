"""Inverse source identification (BASELINE config 5) and parametric (MOR)
training paths.

MOR reference semantics: SURVEY.md §0 item 1 / §3.5 — extra network
inputs mu, training data = cartesian pairing of quadrature points with
parameter samples.
"""

import jax
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import PointData, build_fixed_data
from varnet_tpu.models.source import (
    make_gaussian_source,
    make_mlp_source,
    make_mlp_source_xt,
)
from varnet_tpu.problems.adpde import ADPDE, MORVar
from varnet_tpu.problems.analytic import inverse_source_2d, steady_ad_1d
from varnet_tpu.geometry.domain import Domain1D


def test_inverse_source_trains():
    case = inverse_source_2d(kappa=0.1, n_obs=100)
    pde = case["pde"]
    lo, hi = pde.domain.bounds
    source_fn, phi0 = make_mlp_source(
        jax.random.PRNGKey(1), 2, hidden=(8, 8), lo=lo, hi=hi
    )
    obs = PointData(
        coords=case["obs_x"],
        values=case["obs_u"],
        mask=np.ones(case["obs_x"].shape[0]),
    )
    vn = VarNet(
        pde, layer_width=(8, 8), disc_num=10, n_devices=2,
        source_fn=source_fn, source_init=phi0, obs_data=obs,
    )
    res = vn.train(
        epoch_num=200, weight=(1.0, 10.0, 100.0), save_freq=100, verbose=False
    )
    assert "loss_obs" in res.losses[-1]
    assert res.losses[-1]["loss"] < res.losses[0]["loss"]
    # the source pytree received gradient updates
    moved = any(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(vn.theta["src"]),
            jax.tree_util.tree_leaves(phi0),
        )
    )
    assert moved


def test_gaussian_source_param_form():
    source_fn, phi0 = make_gaussian_source(2)
    x = np.array([[0.0, 0.0], [1.0, 1.0]])
    import jax.numpy as jnp

    s = source_fn(phi0, jnp.asarray(x))
    assert s.shape == (2,)
    assert float(s[0]) > float(s[1])  # peak at the (origin) center


def test_source_xt_shapes():
    source_fn, phi0 = make_mlp_source_xt(jax.random.PRNGKey(0), 2, hidden=(4,))
    import jax.numpy as jnp

    s = source_fn(phi0, jnp.ones((5, 2)), jnp.zeros(5))
    assert s.shape == (5,)


def test_mor_assembly_and_training():
    """Parametric mode: network input = (x, mu); fixed data is the
    cartesian pairing of points with MOR samples."""
    mor = MORVar(samples=np.array([[0.5], [1.0], [1.5]]))
    pde = ADPDE(
        Domain1D(0.0, 1.0),
        diff=0.1,
        vel=lambda x, t, mu: np.broadcast_to(
            (mu[:, 0] if mu is not None else 1.0), (np.atleast_2d(x).shape[0],)
        )[:, None],
        source=0.0,
        bcs=[0.0, 1.0],
        mor=mor,
    )
    fd = build_fixed_data(pde, 10)
    # 9 interior nodes x 3 samples
    assert fd.static.n_test == 27
    assert fd.static.n_inputs == 2
    # mu column is constant within a sample block and matches the sample
    mu_col = fd.quad.coords[:, :, 1]
    assert np.allclose(mu_col[:9], 0.5)
    assert np.allclose(mu_col[9:18], 1.0)
    # velocity evaluated with the paired mu
    assert np.allclose(fd.quad.vel[:9, :, 0], 0.5)
    assert np.allclose(fd.quad.vel[18:, :, 0], 1.5)

    vn = VarNet(pde, layer_width=(8, 8), disc_num=10, n_devices=1)
    res = vn.train(epoch_num=150, weight=(1.0, 10.0), save_freq=75, verbose=False)
    assert res.losses[-1]["loss"] < res.losses[0]["loss"]
    # evaluate at an explicit mu
    u = vn.evaluate(np.linspace(0, 1, 5)[:, None], mu=np.array([1.0]))
    assert u.shape == (5,)


@pytest.mark.e2e
@pytest.mark.slow
def test_mor_holdout_mu_generalizes():
    """The amortized network interpolates to a held-out mu between the
    training samples (the MOR claim — SURVEY.md §0 item 1).  CPU budget:
    loose bounds; the tight numbers live in benchmarks/results/
    mor_accuracy.json (VERDICT r1 missing #3)."""
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.utils.helpers import rel_l2_error

    kappa = 0.1
    vels = [0.5, 1.0, 1.5, 2.0]

    def vel(x, t, mu):
        n = np.atleast_2d(x).shape[0]
        v = mu[:, 0] if mu is not None else np.full(n, vels[0])
        return v[:, None]

    def c_ex(x, t, mu):
        x1 = np.atleast_2d(x)[:, 0]
        pe = (mu[:, 0] if mu is not None else vels[0]) / kappa
        return np.expm1(pe * x1) / np.expm1(pe)

    pde = ADPDE(Domain1D(0.0, 1.0), diff=kappa, vel=vel, source=0.0,
                bcs=[0.0, 1.0], c_ex=c_ex,
                mor=MORVar(samples=np.array([[v] for v in vels])))
    vn = VarNet(pde, layer_width=(16, 16), disc_num=24, n_devices=2,
                optimizer=OptimizerConfig(lr=2e-3))
    vn.train(epoch_num=4000, weight=(1.0, 10.0), save_freq=2000,
             verbose=False)
    x = np.linspace(0, 1, 101)[:, None]
    errs = {}
    for v in [1.25, 1.75]:  # held-out: never in the training pairing
        mu = np.array([v])
        u = vn.evaluate(x, mu=mu)
        mu_b = np.broadcast_to(mu[None, :], (x.shape[0], 1))
        errs[v] = rel_l2_error(u, c_ex(x, None, mu_b))
    assert max(errs.values()) < 0.2, errs


def test_mor_2d_case_assembles_and_residual_vanishes():
    """The 2-D MOR family's exact solution zeroes the assembled weak
    residual (validates the mu-paired assembly without training)."""
    from varnet_tpu.problems.analytic import mor_steady_ad_2d

    case = mor_steady_ad_2d()
    maxr = []
    for disc in (8, 16):
        fd = build_fixed_data(case["pde"], disc)

        def grad(x, t, fd=fd):
            # rebuild mu from the paired coords (grad_fn gets x,t only)
            k, nq, _ = fd.quad.coords.shape
            mu = fd.quad.coords.reshape(k * nq, -1)[:, 2:]
            return case["c_ex_grad"](x, t, mu)

        q = fd.quad
        k, nq, _ = q.coords.shape
        flat = q.coords.reshape(k * nq, -1)
        gu = grad(flat[:, :2], None).reshape(k, nq, 2)
        integrand = (np.einsum("kqd,kqd->kq", q.vel, gu) - q.src) * q.N
        integrand += q.kappa * np.einsum("kqd,qd->kq", gu, q.dN)
        r = np.einsum("kq,q->k", integrand, q.w) * q.mask
        maxr.append(np.max(np.abs(r)) / np.sum(q.w))
    assert maxr[1] < maxr[0] / 3.0, maxr
    assert maxr[1] < 5e-2, maxr


def test_bc_none_segment_skipped():
    """Segments with bcs=None contribute no BC points (free boundary)."""
    from varnet_tpu.problems.analytic import contaminant_transport_2d

    case = contaminant_transport_2d()
    fd = build_fixed_data(case["pde"], 10, b_disc_num=5, t_disc_num=4)
    # 3 constrained segments x 5 half-open pts x (t_disc+1=5) time levels
    assert fd.static.n_bc == 3 * 5 * 5
