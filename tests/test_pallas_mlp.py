"""Fused Pallas forward+jacobian kernel vs the autodiff reference.

Runs in Pallas interpreter mode on the CPU test backend (SURVEY.md §7
"hard parts" item 1: "the jvp/vmap path is the correct-by-construction
fallback" — these tests pin the kernel to it, values AND parameter
gradients).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.models.mlp import (
    init_mlp,
    make_input_scaling,
    mlp_value_and_jac,
    mlp_value_and_jac_auto,
)
from varnet_tpu.ops.pallas_mlp import pallas_value_and_jac

pvj = functools.partial(pallas_value_and_jac, tile=128, interpret=True)


@pytest.mark.parametrize("n_in,hidden", [(1, (8,)), (2, (16, 16)), (3, (8, 8, 8))])
@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "sin"])
def test_forward_matches_auto(n_in, hidden, activation):
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, n_in, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, n_in))
    u_ref, du_ref = mlp_value_and_jac_auto(params, x, activation)
    u, du = pvj(params, x, activation)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


def test_forward_with_scaling():
    params = init_mlp(jax.random.PRNGKey(0), 3, (16, 16))
    lo = np.array([0.0, -1.0, 2.0])
    hi = np.array([2.0, 3.0, 7.0])
    scale, shift = make_input_scaling(lo, hi)
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (150, 3), minval=lo.min(), maxval=hi.max()
    )
    u_ref, du_ref = mlp_value_and_jac(params, x, "tanh", scale, shift)
    u, du = pvj(params, x, "tanh", scale, shift)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


def test_padding_odd_point_count():
    params = init_mlp(jax.random.PRNGKey(0), 2, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (77, 2))  # not a tile multiple
    u_ref, du_ref = mlp_value_and_jac(params, x, "tanh")
    u, du = pvj(params, x, "tanh")
    assert u.shape == (77,) and du.shape == (77, 2)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "sin"])
def test_param_grads_match_auto(activation):
    """The custom-VJP backward kernel must reproduce autodiff parameter
    gradients of a loss that touches BOTH u and du (like the weak form)."""
    n_in = 3
    params = init_mlp(jax.random.PRNGKey(0), n_in, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, n_in))
    cu = jax.random.normal(jax.random.PRNGKey(2), (256,))
    cd = jax.random.normal(jax.random.PRNGKey(3), (256, n_in))

    def loss(vj_fn, params):
        u, du = vj_fn(params, x, activation)
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(u * u)

    g_ref = jax.grad(functools.partial(loss, mlp_value_and_jac))(params)
    g = jax.grad(functools.partial(loss, pvj))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_ff_kernel_matches_jnp_path():
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import pallas_ff_value_and_jac

    n_in, n_feat = 3, 8
    b = make_fourier_features(jax.random.PRNGKey(0), n_in, n_feat, scale=1.3)
    params = init_mlp(jax.random.PRNGKey(1), 2 * n_feat, (16, 16))
    scale, shift = make_input_scaling(np.zeros(n_in), 2 * np.ones(n_in))
    x = jax.random.uniform(jax.random.PRNGKey(2), (150, n_in), maxval=2.0)
    u_ref, du_ref = ff_value_and_jac(b, params, x, "tanh", scale, shift)
    u, du = pallas_ff_value_and_jac(b, params, x, "tanh", scale, shift,
                                    tile=128, interpret=True)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-4, atol=2e-5)


def test_ff_kernel_param_grads():
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import pallas_ff_value_and_jac

    n_in, n_feat = 2, 4
    b = make_fourier_features(jax.random.PRNGKey(0), n_in, n_feat)
    params = init_mlp(jax.random.PRNGKey(1), 2 * n_feat, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(2), (256, n_in))
    cu = jax.random.normal(jax.random.PRNGKey(3), (256,))
    cd = jax.random.normal(jax.random.PRNGKey(4), (256, n_in))

    def loss(vj, params):
        u, du = vj(b, params, x, "tanh")
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(u * u)

    g_ref = jax.grad(functools.partial(loss, ff_value_and_jac))(params)
    pvj_ff = functools.partial(pallas_ff_value_and_jac, tile=128, interpret=True)
    g = jax.grad(functools.partial(loss, pvj_ff))(params)
    for a, b2 in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b2, rtol=5e-4, atol=5e-5)


def test_param_grads_with_scaling_multitile():
    n_in = 2
    params = init_mlp(jax.random.PRNGKey(0), n_in, (16, 16))
    scale, shift = make_input_scaling(np.zeros(2), 2 * np.ones(2))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, n_in), maxval=2.0)

    def loss(vj_fn, params):
        u, du = vj_fn(params, x, "tanh", scale, shift)
        return jnp.sum((u - 1.0) ** 2) + jnp.sum(du * du)

    g_ref = jax.grad(functools.partial(loss, mlp_value_and_jac))(params)
    g = jax.grad(functools.partial(loss, pvj))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
