"""Fourier-feature embedding path: jacobian correctness + training."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.models.mlp import (
    ff_apply,
    ff_value_and_jac,
    init_mlp,
    make_fourier_features,
    make_input_scaling,
)
from varnet_tpu.problems.analytic import steady_ad_2d


@pytest.mark.slow
def test_ff_jacobian_matches_autodiff():
    key = jax.random.PRNGKey(0)
    n_in, n_feat = 3, 8
    b = make_fourier_features(key, n_in, n_feat, scale=1.5)
    params = init_mlp(jax.random.PRNGKey(1), 2 * n_feat, (16,))
    scale, shift = make_input_scaling(np.zeros(n_in), 2 * np.ones(n_in))
    x = jax.random.uniform(jax.random.PRNGKey(2), (50, n_in), maxval=2.0)

    u, du = ff_value_and_jac(b, params, x, "tanh", scale, shift)

    def single(xi):
        return ff_apply(b, params, xi[None, :], "tanh", scale, shift)[0]

    u_ref = jax.vmap(single)(x)
    du_ref = jax.vmap(jax.grad(single))(x)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-4, atol=2e-5)


def test_varnet_fourier_trains():
    case = steady_ad_2d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=12, n_devices=2,
                fourier_features=8, fourier_scale=1.0)
    assert vn.fourier_b is not None and not vn.use_pallas
    res = vn.train(epoch_num=300, weight=(1.0, 10.0), save_freq=150,
                   verbose=False)
    assert res.losses[-1]["loss"] < res.losses[0]["loss"]
    # evaluate goes through the embedded apply path
    u = vn.evaluate(np.array([[0.5, 0.5]]))
    assert u.shape == (1,)


def test_multiscale_fourier_features():
    """scale may be a sequence: per-scale blocks concatenated (n_feat split
    evenly, remainder to the first block) — benchmarks/contaminant_rep_probe2
    measured the (0.5, 2.0) basis at 0.8% supervised rel-L2 on the
    contaminant field where single scales plateau 5-10x higher."""
    key = jax.random.PRNGKey(3)
    b = make_fourier_features(key, 3, 7, scale=[0.5, 2.0])
    assert b.shape == (3, 7)
    # first block (4 cols) drawn at scale 0.5, second (3 cols) at 2.0:
    # check the sample std honors the split (loose tolerance, tiny sample)
    assert float(jnp.abs(b[:, :4]).std()) < float(jnp.abs(b[:, 4:]).std())

    vn = VarNet(steady_ad_2d(kappa=0.1)["pde"], layer_width=(8,),
                disc_num=8, n_devices=1,
                fourier_features=8, fourier_scale=(0.5, 2.0))
    assert vn.fourier_b.shape == (2, 8)  # steady 2-D: inputs (x, y)
    res = vn.train(epoch_num=60, weight=(1.0, 10.0), save_freq=60,
                   verbose=False)
    assert np.isfinite(res.losses[-1]["loss"])
