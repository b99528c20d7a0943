"""Advection-diffusion-REACTION extension: weak residual of the analytic
solution vanishes through the full pipeline, and training converges."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.ops.residual import weak_residual
from varnet_tpu.problems.analytic import steady_adr_1d


def test_residual_of_analytic_with_reaction_vanishes():
    """The keystone test (SURVEY.md §4) extended to the reaction term:
    plugging u*, grad u* into the contraction must give r_k ~ O(h^2)."""
    case = steady_adr_1d(kappa=0.1, vel=1.0, react=2.0)
    fd = build_fixed_data(case["pde"], 64)
    q = fd.quad
    k, nq, _ = q.coords.shape
    flat = q.coords.reshape(-1, 1)
    u = case["c_ex"](flat).reshape(k, nq)
    gu = case["c_ex_grad"](flat).reshape(k, nq, 1)
    r = weak_residual(
        jnp.asarray(gu), jnp.asarray(q.N), jnp.asarray(q.dN), jnp.asarray(q.w),
        jnp.asarray(q.kappa), jnp.asarray(q.vel), jnp.asarray(q.src),
        u=jnp.asarray(u), react=jnp.asarray(q.react),
    )
    # normalize by support volume: average residual density ~ O(h^2)
    r_density = np.asarray(r) / float(np.sum(q.w))
    assert np.abs(r_density).max() < 5e-3

    # WITHOUT the reaction term the residual must NOT vanish (the term
    # is load-bearing for this manufactured problem)
    r_wrong = weak_residual(
        jnp.asarray(gu), jnp.asarray(q.N), jnp.asarray(q.dN), jnp.asarray(q.w),
        jnp.asarray(q.kappa), jnp.asarray(q.vel), jnp.asarray(q.src),
    )
    assert np.abs(np.asarray(r_wrong) / float(np.sum(q.w))).max() > 1e-1


@pytest.mark.slow
def test_reaction_training_converges():
    case = steady_adr_1d(kappa=0.1, vel=1.0, react=2.0)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=24, n_devices=2)
    assert vn.has_react
    res = vn.train(epoch_num=1500, weight=(1.0, 10.0), save_freq=750,
                   verbose=False)
    assert res.errors[-1] < res.errors[0]
    r = vn.refine_lm(steps=20, weight=(1.0, 10.0), save_freq=20,
                     verbose=False, matmul_precision=None)
    assert r.best_error() < 5e-3
