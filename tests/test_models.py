"""Model-layer tests: the fused forward value+jacobian propagation must
agree with JAX autodiff (values, input jacobians, AND parameter gradients
through the whole weak-form-style objective)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.models.mlp import (
    init_mlp,
    make_input_scaling,
    mlp_apply,
    mlp_value_and_jac,
    mlp_value_and_jac_auto,
    param_count,
)


@pytest.fixture()
def x64():
    """Exact-math comparisons run in f64; saturated tanh makes BOTH forward
    -mode and reverse-mode input jacobians ~1e-3 ill-conditioned in f32, so
    tight f32 comparisons would test conditioning, not correctness."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("activation", ["tanh", "sigmoid"])
@pytest.mark.parametrize("scaled", [False, True])
@pytest.mark.slow
def test_value_and_jac_matches_autodiff(activation, scaled, x64):
    key = jax.random.PRNGKey(0)
    n_in = 3
    params = init_mlp(key, n_in, [8, 8], dtype=jnp.float64)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (17, n_in), minval=-1, maxval=2, dtype=jnp.float64
    )
    if scaled:
        scale, shift = make_input_scaling(
            [-1.0, -1.0, 0.0], [2.0, 2.0, 1.0], dtype=jnp.float64
        )
    else:
        scale = shift = None
    u1, j1 = mlp_value_and_jac(params, x, activation, scale, shift)
    u2, j2 = mlp_value_and_jac_auto(params, x, activation, scale, shift)
    np.testing.assert_allclose(u1, u2, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(j1, j2, rtol=1e-12, atol=1e-13)
    u3 = mlp_apply(params, x, activation, scale, shift)
    np.testing.assert_allclose(u1, u3, rtol=1e-12, atol=1e-13)


def test_value_and_jac_f32_sane():
    """f32 agreement between forward- and reverse-mode at the conditioning
    floor (inputs pre-scaled to [-1, 1], the production configuration)."""
    params = init_mlp(jax.random.PRNGKey(0), 2, [16, 16])
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 2), minval=-1, maxval=1)
    u1, j1 = mlp_value_and_jac(params, x)
    u2, j2 = mlp_value_and_jac_auto(params, x)
    np.testing.assert_allclose(u1, u2, rtol=1e-5, atol=1e-6)
    # forward- vs reverse-mode in f32 agree only to ~1e-2 relative through
    # stacked tanh layers (exact math is pinned by the f64 test above);
    # this guards against gross dtype/shape regressions only.
    np.testing.assert_allclose(j1, j2, rtol=2e-2, atol=5e-3)


@pytest.mark.slow
def test_parameter_gradients_through_jacobian(x64):
    """grad wrt params of an objective using (u, du) must match autodiff of
    the same objective built on the auto path."""
    key = jax.random.PRNGKey(2)
    params = init_mlp(key, 2, [6], dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(3), (9, 2), dtype=jnp.float64)

    def obj(fn, p):
        u, du = fn(p, x, "tanh", None, None)
        return jnp.sum(u**2) + jnp.sum(du**2)

    g1 = jax.grad(lambda p: obj(mlp_value_and_jac, p))(params)
    g2 = jax.grad(lambda p: obj(mlp_value_and_jac_auto, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_input_scaling_maps_to_unit_box():
    scale, shift = make_input_scaling([0.0, -2.0], [4.0, 2.0])
    lo = (jnp.array([0.0, -2.0]) - shift) * scale
    hi = (jnp.array([4.0, 2.0]) - shift) * scale
    np.testing.assert_allclose(lo, [-1.0, -1.0])
    np.testing.assert_allclose(hi, [1.0, 1.0])


def test_param_count():
    params = init_mlp(jax.random.PRNGKey(0), 3, [10, 20])
    # (3*10+10) + (10*20+20) + (20*1+1)
    assert param_count(params) == 40 + 220 + 21


def test_jit_and_vmap_compatible():
    params = init_mlp(jax.random.PRNGKey(0), 2, [5])
    x = jnp.ones((4, 2))
    u, du = jax.jit(lambda p, x: mlp_value_and_jac(p, x, "tanh", None, None))(params, x)
    assert u.shape == (4,) and du.shape == (4, 2)


import pytest


@pytest.mark.parametrize("ff", [None, 16], ids=["mlp", "fourier"])
def test_evaluate_grad_matches_finite_differences(ff):
    """VarNet.evaluate_grad (beyond-reference flux evaluation): the
    returned spatial gradient and u_t match central differences of
    evaluate() on an untrained net — an exactness check of the public
    jacobian surface (plain MLP AND the Fourier-feature jac backend),
    no training needed."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import transient_ad_2d

    case = transient_ad_2d()
    vn = VarNet(case["pde"], layer_width=(10, 10), disc_num=6,
                t_disc_num=4, b_disc_num=4, n_devices=1,
                fourier_features=ff)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.2, 0.8, size=(40, 2))
    t = rng.uniform(0.1, 0.4, size=(40,))
    out = vn.evaluate_grad(x, t)
    assert out["u"].shape == (40,) and out["grad"].shape == (40, 2)

    # eps balances truncation O(eps^2) against f32 rounding O(1e-7/eps):
    # 1e-3 keeps both near 1e-4 relative
    eps = 1e-3
    for j in range(2):
        dxp = x.copy(); dxp[:, j] += eps
        dxm = x.copy(); dxm[:, j] -= eps
        fd = (vn.evaluate(dxp, t) - vn.evaluate(dxm, t)) / (2 * eps)
        # a wrong jacobian is O(1) off; the band only needs to absorb
        # f32 FD noise (larger on the oscillatory Fourier basis)
        np.testing.assert_allclose(out["grad"][:, j], fd, rtol=2e-2,
                                   atol=3e-5)
    fd_t = (vn.evaluate(x, t + eps) - vn.evaluate(x, t - eps)) / (2 * eps)
    np.testing.assert_allclose(out["u_t"], fd_t, rtol=2e-2, atol=3e-5)
    np.testing.assert_allclose(out["u"], vn.evaluate(x, t), rtol=1e-5)
