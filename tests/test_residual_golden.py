"""Golden-value test: the jitted weak-form loss must match an independent,
loop-based pure-NumPy re-derivation (SURVEY.md §4 'golden-value tests')."""

import jax
import jax.numpy as jnp
import numpy as np

from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.models.mlp import init_mlp
from varnet_tpu.problems.analytic import transient_ad_2d
from varnet_tpu.train.loss import make_loss_fn


def _np_mlp_value_and_jac(params, x, activation="tanh"):
    """Independent NumPy MLP forward + input jacobian (per-point loops)."""
    act = np.tanh if activation == "tanh" else lambda z: 1 / (1 + np.exp(-z))
    us, js = [], []
    for xi in x:
        a = xi.copy()
        jac = np.eye(x.shape[1])
        for layer in params[:-1]:
            w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
            z = a @ w + b
            a = act(z)
            da = 1 - a**2 if activation == "tanh" else a * (1 - a)
            jac = (jac @ w) * da[None, :]
        w, b = np.asarray(params[-1]["w"]), np.asarray(params[-1]["b"])
        us.append(float(a @ w[:, 0] + b[0]))
        js.append(jac @ w[:, 0])
    return np.array(us), np.array(js)


def _np_loss(params, fixed, weights, normalize=False):
    q = fixed.quad
    k, nq, n_in = q.coords.shape
    d = q.dN.shape[1]
    td = fixed.static.time_dependent
    flat = np.asarray(q.coords).reshape(k * nq, n_in)
    u, j = _np_mlp_value_and_jac(params, flat)
    gu = j[:, :d].reshape(k, nq, d)
    integrand = (np.einsum("kqd,kqd->kq", q.vel, gu) - q.src) * q.N
    integrand += q.kappa * np.einsum("kqd,qd->kq", gu, q.dN)
    if td:
        integrand += j[:, d].reshape(k, nq) * q.N
    r = np.einsum("kq,q->k", integrand, q.w)
    if normalize:
        r = r / np.sum(q.w)
        loss_int = np.sum(q.mask * r**2) / fixed.static.n_test
    else:
        loss_int = np.sum(q.mask * r**2)

    u_bc, _ = _np_mlp_value_and_jac(params, np.asarray(fixed.bc.coords))
    e = (u_bc - fixed.bc.values) * fixed.bc.mask
    loss_bc = np.sum(e**2) / fixed.bc.mask.sum()

    u_ic, _ = _np_mlp_value_and_jac(params, np.asarray(fixed.ic.coords))
    e = (u_ic - fixed.ic.values) * fixed.ic.mask
    loss_ic = np.sum(e**2) / fixed.ic.mask.sum()
    return weights[0] * loss_int + weights[1] * loss_bc + weights[2] * loss_ic


def test_loss_matches_numpy_golden():
    jax.config.update("jax_enable_x64", True)
    try:
        case = transient_ad_2d()
        fixed = build_fixed_data(case["pde"], disc_num=4, t_disc_num=3, b_disc_num=2)
        params = init_mlp(
            jax.random.PRNGKey(7), fixed.static.n_inputs, [7], dtype=jnp.float64
        )

        quad = jax.tree_util.tree_map(jnp.asarray, fixed.quad)
        bc = jax.tree_util.tree_map(jnp.asarray, fixed.bc)
        ic = jax.tree_util.tree_map(jnp.asarray, fixed.ic)
        weights = (2.0, 3.0, 5.0)
        for normalize in (False, True):
            loss_fn = make_loss_fn(
                fixed.static, input_scaling=False, normalize_residual=normalize
            )
            total, aux = jax.jit(
                lambda p: loss_fn(p, quad, bc, ic, None, jnp.array(weights))
            )(params)
            expected = _np_loss(params, fixed, weights, normalize=normalize)
            np.testing.assert_allclose(float(total), expected, rtol=1e-10)
            assert float(aux["loss_int"]) >= 0 and float(aux["loss_bc"]) >= 0
    finally:
        jax.config.update("jax_enable_x64", False)
