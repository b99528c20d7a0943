"""Static-shape guards in train/loss.py (make_loss_fn).

Each of these mis-uses previously failed SILENTLY:

  * has_obs with a 3-vector of weights: JAX clamps the weights[3]
    gather to weights[2], so w_obs silently became w_ic;
  * has_obs with obs=None: the observation term silently dropped out
    of the loss (and, mirrored in gauss_newton.make_residual_fn, out
    of the LM objective) while training kept "succeeding";
  * fused_residual together with trainable diff_fn/vel_fn: the fused
    kernel integrates the FIXED quad.kappa/quad.vel tables, so
    theta['kap']/['vel'] got exactly zero gradient with no error.
"""

import jax
import numpy as np
import pytest

from varnet_tpu.fem.assembly import PointData, build_fixed_data
from varnet_tpu.models.mlp import init_mlp
from varnet_tpu.problems.analytic import steady_ad_2d
from varnet_tpu.train.loss import make_loss_fn


def _setup():
    case = steady_ad_2d()
    fd = build_fixed_data(case["pde"], 6, b_disc_num=6)
    theta = init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (8,))
    return fd, theta


def test_has_obs_requires_fourth_weight():
    fd, theta = _setup()
    obs = PointData(coords=fd.bc.coords, values=fd.bc.values,
                    mask=np.ones(fd.bc.coords.shape[0]))
    loss_fn = make_loss_fn(fd.static, has_obs=True,
                           n_obs_real=obs.coords.shape[0])
    with pytest.raises(ValueError, match="4th"):
        loss_fn(theta, fd.quad, fd.bc, None, obs, [1.0, 1.0, 1.0])


def test_has_obs_rejects_none_obs():
    fd, theta = _setup()
    loss_fn = make_loss_fn(fd.static, has_obs=True, n_obs_real=4)
    with pytest.raises(ValueError, match="obs batch is None"):
        loss_fn(theta, fd.quad, fd.bc, None, None, [1.0, 1.0, 1.0, 1.0])


def test_fused_rejects_trainable_coefficients():
    fd, _ = _setup()
    dummy = object()
    for hook in ({"diff_fn": lambda p, x, t: p}, {"vel_fn": lambda p, x, t: p}):
        with pytest.raises(ValueError, match="diff_fn/vel_fn"):
            make_loss_fn(fd.static, fused_residual=dummy, **hook)


def test_lm_residual_rejects_none_obs():
    from varnet_tpu.train.gauss_newton import make_residual_fn

    fd, theta = _setup()
    res_fn = make_residual_fn(fd.static, has_obs=True, n_obs_real=4)
    with pytest.raises(ValueError, match="obs batch is None"):
        res_fn(theta, fd.quad, fd.bc, None, None, [1.0, 1.0, 1.0, 1.0])
