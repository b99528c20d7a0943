"""Inverse source identification (BASELINE config 5) and parametric (MOR)
training paths.

MOR reference semantics: SURVEY.md §0 item 1 / §3.5 — extra network
inputs mu, training data = cartesian pairing of quadrature points with
parameter samples.
"""

import jax
import numpy as np

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


def test_bc_none_segment_skipped():
    """Segments with bcs=None contribute no BC points (free boundary)."""
    from varnet_tpu.problems.analytic import contaminant_transport_2d

    case = contaminant_transport_2d()
    fd = build_fixed_data(case["pde"], 10, b_disc_num=5, t_disc_num=4)
    # 3 constrained segments x 5 half-open pts x (t_disc+1=5) time levels
    assert fd.static.n_bc == 3 * 5 * 5
